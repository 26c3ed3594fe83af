"""Storage-handler dispatch — parity with the reference's
``get_handler`` (reference: src/cli/server/model/storage_handler.rs:56-71):
resolve a model's ``storage_type`` against the storage config
(``storages.json``, storage_handler.rs:73-100) and hand back the
matching backend. Unknown storage types are rejected the way the
reference's enum does (storage_handler.rs:40-42 — only ``json`` exists
there; this engine adds ``parquet`` as the scale path and default).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from gus_spark.errors import StorageError
from gus_spark.model.types import ModelDefinition
from gus_spark.storage.json_store import JsonFileStore
from gus_spark.storage.parquet_store import ParquetStore


def get_handler(
    spark: SparkSession,
    model: ModelDefinition,
    storage_config: dict | None = None,
    warehouse_dir: str = "./warehouse",
):
    """Return the CRUD backend for ``model.storage_type``."""
    config = (storage_config or {}).get(model.storage_type, {})
    if model.storage_type == "parquet":
        return ParquetStore(spark, config.get("warehouse_dir", warehouse_dir))
    if model.storage_type == "json":
        return JsonFileStore(spark, config.get("storage_file"))
    raise StorageError(
        f"unknown storage type {model.storage_type!r} for model "
        f"{model.model_name!r}"
    )
