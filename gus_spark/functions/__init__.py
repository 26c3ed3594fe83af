from gus_spark.functions.deterministic import davg, dsum  # noqa: F401
