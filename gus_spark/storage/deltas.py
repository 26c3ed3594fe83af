"""Delta-directory maintenance for append-only index tables.

The incremental index paths (VectorIndex codes, MinHashIndex bands /
shingles) append one small delta directory per batch — the right write
shape for streaming ingest, but left alone it is small-file death: a
year of micro-batches is ~100k tiny files whose per-file open/footer
cost dominates every search. This module is the compaction half of the
bargain, mirroring ParquetStore.maintain's heuristics (file-count
threshold → fold into a few well-laid-out files).

Layout matters as much as count: the compacted output is
range-partitioned and sorted on the index's probe key (cell for IVF-PQ
codes, band hash for LSH bands), so parquet row-group stats prune a
probe to the files/pages that can contain its key — compaction makes
searches faster, not just the filesystem happier.

Crash safety: the compacted output is written to a dot-prefixed temp
directory (invisible to Spark's hidden-file filter), atomically renamed
into place, and only then are the source deltas removed. A crash
between rename and removal leaves duplicate rows, which every reader of
these tables tolerates (search collapses duplicate candidates before
ranking; band-join candidates are distinct()-ed) and the next
compaction removes.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


def count_parquet_files(base: str) -> int:
    total = 0
    for _root, _dirs, files in os.walk(base):
        total += sum(1 for f in files if f.endswith(".parquet"))
    return total


def read_deltas(spark: SparkSession, base: str) -> DataFrame:
    return (
        spark.read.option("recursiveFileLookup", "true").parquet(base)
    )


def parquet_rows(path: str) -> int:
    """Row count of every parquet file under ``path`` from footer
    metadata only — no Spark job, no data read."""
    import pyarrow.parquet as pq

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += pq.ParquetFile(
                    os.path.join(root, f)
                ).metadata.num_rows
    return total


def tombstone_fold_due(
    rows_path: str, tomb_docs: int, max_tomb_frac: float
) -> bool:
    """The shared tombstone-fraction compaction trigger (VectorIndex /
    MinHashIndex maintain): fold when tombstoned rows exceed
    ``max_tomb_frac`` of the LIVE rows under ``rows_path`` — totals
    from parquet footers only, no Spark job.

    HEURISTIC, deliberately: ``tomb_docs`` counts documents while the
    footer total counts physical rows, and a tombstoned doc can hold
    more than one physical row (the same id appended under two batch
    keys, or crash-replay leftovers the delta contract tolerates) —
    then the live denominator overcounts and the fold fires LATER
    than a strict reading of max_tomb_frac. That error is bounded by
    the duplicate-row fraction (near zero outside crash windows,
    self-healing at the next fold, which drops both the duplicates
    and the tombstoned rows) and errs only toward deferring an
    optimization, never toward wrong results — the serving anti-join
    is what hides tombstoned rows, not this trigger. Exactness here
    would cost a distinct-id Spark job on every maintain() poll,
    the wrong trade for a fold-scheduling hint."""
    if not tomb_docs:
        return False
    total = parquet_rows(rows_path) if os.path.isdir(rows_path) else 0
    live = total - tomb_docs
    return live <= 0 or tomb_docs / live > max_tomb_frac


def compact_deltas(
    spark: SparkSession,
    base: str,
    target_files: int,
    range_cols: list[str] | None = None,
    filter_fn=None,
) -> int:
    """Fold every delta directory under ``base`` into one compacted
    delta of ``target_files`` files, range-partitioned and sorted on
    ``range_cols`` (falls back to round-robin when None). Returns the
    resulting parquet file count. ``filter_fn`` (DataFrame ->
    DataFrame), when given, transforms the unioned rows before the
    rewrite — the tombstone-fold hook: dropped rows disappear
    PHYSICALLY, with the usual crash contract (old deltas removed only
    after the compacted delta is atomically in place, so a crash
    leaves either the old rows or the filtered rows, never neither)."""
    old = [
        d
        for d in os.listdir(base)
        if d.startswith("delta-")
        and os.path.isdir(os.path.join(base, d))
    ]
    if not old:
        return 0
    df = read_deltas(spark, base)
    if filter_fn is not None:
        df = filter_fn(df)
    if range_cols:
        df = df.repartitionByRange(target_files, *range_cols)
        df = df.sortWithinPartitions(*range_cols)
    else:
        df = df.repartition(target_files)
    token = uuid.uuid4().hex
    tmp = os.path.join(base, f".compacting-{token}")
    df.write.parquet(tmp)
    os.rename(tmp, os.path.join(base, f"delta-compact-{token}"))
    for d in old:
        shutil.rmtree(os.path.join(base, d), ignore_errors=True)
    return count_parquet_files(base)
