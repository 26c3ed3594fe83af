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
