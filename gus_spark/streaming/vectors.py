"""Streaming embedding ingest into the persisted vector index: arriving
batches encode against the frozen quantizer and append their codes —
the similarity twin of streaming.neardup (documents → MinHashIndex).

Each micro-batch costs O(batch): the corpus codes are never read, and
encoding is deterministic against the frozen model, so a drained stream
produces an index bit-identical to batch ``add`` calls of the same rows
(asserted in tests). Replay protection: each micro-batch appends through
``index.add(batch_key=...)``, which writes the batch's codes to a delta
directory NAMED BY THE BATCH ID with overwrite semantics — a
crash-replay of the same batch id replaces its own earlier output
instead of duplicating code rows, so the append is idempotent without
any marker/append atomicity requirement. The done-marker remains as a
cheap skip for already-finished batches.

Re-fit policy stays with the operator: watch ``index.stats()`` cell
skew and rebuild a fresh index when the corpus has drifted — a stream
must never silently re-fit (that would orphan every code row written
so far).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from gus_spark.operators.vector_index import VectorIndex


def vector_index_stream(
    vec_stream: DataFrame,
    index: VectorIndex,
    checkpoint_path: str,
) -> StreamingQuery:
    """Start draining ``vec_stream`` (the index's id/vector columns)
    into ``index``. The index must already be fitted — fitting needs a
    corpus sample, which a stream by definition doesn't have yet."""
    index._load_model()  # fail fast before any batch arrives

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(index.path, f"_batch-{batch_id}.done")
        if os.path.exists(marker):
            return
        if not batch_df.take(1):
            return
        index.add(batch_df, batch_key=f"batch-{batch_id}")
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("done")

    return (
        vec_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
