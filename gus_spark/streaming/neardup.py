"""Streaming near-duplicate detection: a document stream drained through
the incremental MinHash index, micro-batch by micro-batch.

This is the streaming form of the corpus-dedup problem a training-data
pipeline faces at ingest time: documents arrive continuously, and each
arriving batch must be checked against EVERYTHING seen so far — without
re-shingling the corpus. ``MinHashIndex.add_and_find`` already gives the
O(batch + collisions) incremental step (operators/dedup.py); this module
wires it to Structured Streaming with ``foreachBatch``, the standard
pattern for sinks whose write path is richer than an append (here: an
index mutation + a pair append).

Exactly-once story: Structured Streaming replays a micro-batch after a
crash between the sink write and the checkpoint commit. The index
mutation is NOT naturally idempotent (a replayed batch would re-append
its band rows), so each processed batch drops a ``_batch-<id>.done``
marker inside the index directory, written AFTER the index append —
a replayed batch id short-circuits to a no-op. Marker + append are not
atomic (a crash exactly between them duplicates one batch's bands;
band-join candidates are then duplicated but ``distinct()`` inside
add_and_find collapses them, and pair output for that batch was never
committed — so results stay exact).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from gus_spark.operators.dedup import MinHashIndex


def neardup_stream(
    docs_stream: DataFrame,
    index: MinHashIndex,
    pairs_path: str,
    checkpoint_path: str,
) -> StreamingQuery:
    """Start draining ``docs_stream`` (columns: the index's id/text
    columns) through ``index``; near-dup pairs (doc_a, doc_b, jaccard)
    append to ``pairs_path`` as parquet. Returns the started query —
    callers ``processAllAvailable()``/``awaitTermination()`` it."""

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(index.path, f"_batch-{batch_id}.done")
        if os.path.exists(marker):  # crash-replay of a finished batch
            return
        if not batch_df.take(1):
            return
        pairs = index.add_and_find(batch_df)
        pairs.write.mode("append").parquet(pairs_path)
        with open(marker, "w", encoding="utf-8") as fh:
            fh.write("done")

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
