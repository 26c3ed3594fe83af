from gus_spark.sources.readers import read_table, write_partitioned  # noqa: F401
