"""Partitioning patterns for the 100-TB path: bucketed co-located joins
and salted skew aggregation.

These are the two standard answers to "this shuffle is the bottleneck":

- **Bucketing**: persist both join sides bucketed by the join key; a
  later equi-join on that key reads co-located buckets and skips the
  exchange entirely (SortMergeJoin with zero Exchange operators —
  asserted in tests). On a cluster this is the difference between
  re-shuffling 100 TB per join and none.
- **Salting**: a hot key (power-law user, null-heavy dimension) makes
  one reducer the straggler. Two-phase aggregation over (key, salt)
  spreads the hot key across ``n_salts`` reducers, then combines the
  partials — correct for any decomposable aggregate. (AQE's skew-join
  handles the join case; salting covers aggregations and older
  runtimes.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 16,
    sort_by: str | None = None,
) -> None:
    """Persist ``df`` bucketed (and optionally sorted) by ``key`` into
    the session catalog — the co-location contract later joins rely on."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, key)
    )
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key — a
    sort-merge join with no shuffle exchange on either side when bucket
    counts match (the merge hint keeps Catalyst from broadcasting small
    test tables; at the scale bucketing targets, SMJ is the chosen
    strategy anyway)."""
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), key
    )


def zorder_key(
    df: DataFrame, cols: list[str], bits: int = 6
) -> DataFrame:
    """Append ``_zkey``: the Morton (bit-interleaved) code of each
    row's per-column quantile buckets.

    Sorting/range-partitioning by ``_zkey`` clusters rows so that
    EVERY listed column's values are locally narrow inside each file —
    the property multi-column data skipping needs. A single-column
    sort gives perfect min/max pruning on that column and none on the
    others; the z-curve trades a little of the first column's locality
    for bounded spans on all of them.

    Quantile bucketing (``approxQuantile`` per column, one distributed
    pass each, relative error 1e-3) rather than uniform min/max
    buckets, so skewed columns still fill all 2^bits buckets — the
    same per-column range-id construction Delta's OPTIMIZE ZORDER
    uses. The bucket lookup compiles to a when-chain (2^bits - 1
    comparisons, whole-stage-codegen'd); bits=6 × 2 columns = a 4096-
    cell curve, plenty to cluster any practical file count.
    """
    key = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        n_buckets = 1 << bits
        probs = [j / n_buckets for j in range(1, n_buckets)]
        bounds = df.approxQuantile(c, probs, 1e-3)
        bucket = F.lit(0)
        for b, bound in enumerate(bounds):
            bucket = F.when(F.col(c) > F.lit(bound), b + 1).otherwise(bucket)
        for b in range(bits):
            key = key + F.shiftleft(
                F.shiftright(bucket.cast("long"), b).bitwiseAND(F.lit(1)),
                b * len(cols) + i,
            )
    return df.withColumn("_zkey", key)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 6,
) -> None:
    """Write ``df`` as ``n_files`` z-order-clustered parquet files:
    range-partitioned and sorted by the Morton key of ``cols``, then
    the key dropped. Point/range predicates on ANY of ``cols`` skip
    most files via footer min/max stats — the layout lever when one
    table serves several access paths (the single-access-path case is
    plain pk-range compaction)."""
    keyed = zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def salted_sum(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-resistant SUM(value) GROUP BY key.

    Phase 1 groups by (key, salt) — the hot key's rows spread over
    ``n_salts`` reducers; phase 2 combines the partial sums per key.
    Output: (key, total, n_rows), exactly equal to the unsalted result.
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(key, "_salt").agg(
        F.sum(value).alias("_psum"), F.count("*").alias("_pcnt")
    )
    return partial.groupBy(key).agg(
        F.sum("_psum").alias("total"), F.sum("_pcnt").alias("n_rows")
    )
