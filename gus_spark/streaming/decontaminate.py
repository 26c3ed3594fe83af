"""Streaming training-data decontamination: the eval-overlap gate
(operators.decontaminate) applied to a document stream.

Unlike streaming dedup/curation, contamination is a property of each
document against a STATIC benchmark suite — no cross-batch state is
needed. What the streaming form adds is amortization: the benchmark's
distinct gram hashes are computed ONCE and persisted under
``state_dir`` (marker-protected, so a restart reuses them instead of
re-exploding the eval suite), and every micro-batch then runs the
same hash-gram equi-join + min_hits count + anti-join the batch
operator uses — same `token_ngrams` expressions imported from the
operator, so batch and stream cannot drift.

Scale shape per batch: explode the BATCH's grams (O(batch tokens)),
join against the persisted gram table (an eval suite — thousands of
documents; AQE broadcasts it at runtime when it fits), count per doc,
anti-join. Crash-replay: per-batch done-markers make replayed batch
ids no-ops, keeping the appended output exact (the neardup/curation
pattern).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from gus_spark.operators.decontaminate import DEFAULT_N, token_ngrams


def decontaminate_stream(
    docs_stream: DataFrame,
    bench: DataFrame,
    state_dir: str,
    out_path: str,
    checkpoint_path: str,
    n: int = DEFAULT_N,
    min_hits: int = 1,
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
) -> StreamingQuery:
    """Start decontaminating ``docs_stream`` (documents schema) against
    the static ``bench`` suite; clean rows append to ``out_path`` as
    parquet, the benchmark gram-hash table persists under
    ``state_dir``."""
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    os.makedirs(state_dir, exist_ok=True)
    grams_path = os.path.join(state_dir, "bench_grams")
    grams_marker = os.path.join(state_dir, "_bench_grams.done")
    if not os.path.exists(grams_marker):
        # one-time build at (bench_id, gram-hash) granularity:
        # min_hits applies PER BENCHMARK DOCUMENT in the batch
        # operator (>= k grams shared with a SINGLE eval example), so
        # the table must keep bench_id — a global distinct-gram set
        # would let two different eval examples each contribute one
        # hit and wrongly reach min_hits=2. token_ngrams already
        # dedups grams within each bench doc.
        bench.select(
            F.col(bench_id_col).alias("_bid"),
            F.explode(token_ngrams(F.col(bench_text_col), n)).alias("_gram"),
        ).select("_bid", F.xxhash64("_gram").alias("_gh")).write.mode(
            "overwrite"
        ).parquet(grams_path)
        with open(grams_marker, "w", encoding="utf-8") as fh:
            fh.write("done")

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(state_dir, f"_batch-{batch_id}.done")
        if os.path.exists(marker):
            return
        spark = batch_df.sparkSession
        bench_grams = spark.read.parquet(grams_path)
        doc_grams = batch_df.select(
            F.col("doc_id").alias("_did"),
            F.explode(token_ngrams(F.col("text"), n)).alias("_gram"),
        ).select("_did", F.xxhash64("_gram").alias("_gh"))
        dirty = (
            doc_grams.join(bench_grams, "_gh")
            .groupBy("_did", "_bid")
            .agg(F.count("*").alias("_hits"))
            .filter(F.col("_hits") >= min_hits)
            .select("_did")
            .distinct()
        )
        clean = batch_df.join(
            dirty, batch_df["doc_id"] == F.col("_did"), "left_anti"
        )
        if clean.take(1):
            clean.write.mode("append").parquet(out_path)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("done")

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
