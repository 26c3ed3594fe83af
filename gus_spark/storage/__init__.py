from gus_spark.storage.parquet_store import ParquetStore  # noqa: F401
