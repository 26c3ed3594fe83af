"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Repartition when the input has fewer partitions than the cluster
    has slots.

    Small inputs (one parquet file -> one partition) otherwise serialize
    CPU-heavy per-row operators (shingling, hashing, vector folds) onto a
    single core. The shuffle moves only the raw input rows — cheap
    relative to the per-row work this guards. At scale, inputs already
    arrive with >= slots partitions and this is a no-op.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
