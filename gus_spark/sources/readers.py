"""Sources & sinks beyond parquet: CSV / JSON readers bound to the model
registry's DECLARED schemas, and partitioned table writes.

The reference reads one JSON file with no schema discipline beyond
per-record validation (reference: src/cli/server/model/storage_handler/
json/mod.rs:45-72). Here every read applies the model's `StructType` —
`inferSchema` is deliberately not offered: at 100 TB schema inference
is a full extra pass, and silent type drift (a numeric column inferred
as string on one day's files) corrupts downstream joins. Malformed rows
fail fast by default (mode=FAILFAST), matching the engine's strict
ingest posture; pass ``permissive=True`` to quarantine them into
``_corrupt_record`` instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

from gus_spark.errors import StorageError
from gus_spark.model.types import ModelDefinition

_FORMATS = {"csv", "json", "parquet", "orc"}


def read_table(
    spark: SparkSession,
    model: ModelDefinition,
    path: str,
    fmt: str = "parquet",
    permissive: bool = False,
    **options,
) -> DataFrame:
    """Read ``path`` as ``model``'s declared schema (never inferred)."""
    if fmt not in _FORMATS:
        raise StorageError(f"unsupported source format {fmt!r}")
    schema = model.to_struct_type()
    reader = spark.read
    if fmt in ("parquet", "orc"):
        # columnar formats carry their own types; the declared schema
        # still applies (projection + type check), and predicate
        # pushdown / column pruning work identically for both
        return getattr(reader.schema(schema), fmt)(path)
    mode = "PERMISSIVE" if permissive else "FAILFAST"
    if permissive:
        schema = StructType(
            list(schema.fields)
            + [StructField("_corrupt_record", StringType(), True)]
        )
    reader = reader.schema(schema).option("mode", mode)
    if fmt == "csv":
        reader = reader.option("header", options.pop("header", True))
    for key, value in options.items():
        reader = reader.option(key, value)
    return getattr(reader, fmt)(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Hive-layout partitioned write: one directory per partition value.

    Readers filtering on ``partition_cols`` prune entire directories
    before any file I/O (static partition pruning; dynamic pruning
    kicks in for join keys) — the primary data-layout lever at 100 TB:
    a day-partitioned events table makes a one-day query touch 1/365th
    of the files regardless of total size.
    """
    df.write.mode(mode).partitionBy(*partition_cols).format(fmt).save(path)
