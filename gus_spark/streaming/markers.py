"""Content-fingerprinted done-markers for ``foreachBatch`` stages.

The round-6 design keyed done-markers on the streaming ``batch_id``
alone. That id is only meaningful WITHIN one checkpoint lineage: after
a checkpoint loss the restarted query renumbers batches from 0, a
stale ``_batch-0.done`` short-circuits the handler, and any data that
arrived since the marker was written is silently never processed
(round-7 review finding, reproduced empirically).

The marker therefore now records WHAT the batch contained — a cheap
input fingerprint, ``{"n": row count, "xor": bit-xor of
xxhash64(id)}`` (one O(batch) map-side agg; order/partitioning
independent) — and the skip applies ONLY when the delivered batch
matches it:

- marker exists, fingerprint matches  → genuine crash-replay of a
  completed batch (same lineage, or a fresh checkpoint over an
  unchanged source with identical batching): skip, exactly as before;
- marker exists, fingerprint differs → the marker belongs to a
  DIFFERENT lineage (checkpoint wiped/moved while the source grew).
  Every stage in this repo runs ``strict=True`` and raises with
  recovery guidance: batch-keyed outputs (curation/decontamination
  partitions, MinHash/vector index deltas keyed by batch id) cannot
  safely interleave two batchings — the same rows would land under
  different keys than the stale state holds, duplicating across keys.
  ``strict=False`` (reprocess on mismatch) exists for a future stage
  whose write path is genuinely content-keyed rather than
  batch-keyed;
- legacy pre-fingerprint markers (body ``"done"``) are treated as a
  mismatch.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SKIP = "skip"
PROCESS = "process"


def batch_fingerprint(batch_df: DataFrame, id_col: str) -> dict:
    """Order-independent input fingerprint: one map-side agg job."""
    row = batch_df.agg(
        F.count("*").alias("n"),
        F.expr(f"bit_xor(xxhash64({id_col}))").alias("x"),
    ).first()
    return {"n": row["n"], "xor": row["x"]}


def batch_width(batch_df: DataFrame) -> int:
    """Volume-proportional output-file budget for one micro-batch: the
    batch's own SCAN partition count (its input files/splits), never
    ``spark.sql.shuffle.partitions``. Any exchange inside a per-batch
    transform re-partitions the (usually small) batch to the session
    constant, so an unchecked publish emits ~32 part files per trigger
    regardless of carried volume — small-file death for the table AND
    a trigger-count explosion for the next stage's file source, which
    consumes per FILE (measured before this bound: 8 arrival batches
    became 256 downstream triggers and a 50x composed-pipeline wall at
    sf0.1 under maxFilesPerTrigger=1 — tools/pipeline_stream_bench.py).
    A genuinely large trigger scans many splits and keeps writing many
    files, so downstream parallelism survives at scale; coalesce to
    this width narrows only the post-exchange stage, which holds
    exactly the batch's rows."""
    return max(1, batch_df.rdd.getNumPartitions())


def check_marker(
    state_dir: str, batch_id: int, fp: dict, *, strict: bool
) -> str:
    """Return SKIP when this exact batch already completed, PROCESS
    when it must (re)run. Raises ValueError on a strict lineage
    divergence (marker present for different content)."""
    marker = _path(state_dir, batch_id)
    if not os.path.exists(marker):
        return PROCESS
    try:
        with open(marker, encoding="utf-8") as fh:
            stored = json.load(fh)
    except (json.JSONDecodeError, UnicodeDecodeError):
        stored = None  # legacy "done" body (pre-fingerprint layout)
    if stored == fp:
        return SKIP
    if strict:
        raise ValueError(
            f"done-marker for batch {batch_id} in {state_dir!r} was "
            f"written for different input ({stored} != {fp}): the "
            "stream's checkpoint and this state dir belong to "
            "different lineages (was the checkpoint wiped while the "
            "source grew?). Restore the original checkpoint, or "
            "rebuild state dir + output + checkpoint together."
        )
    return PROCESS


def publish_batch(df: DataFrame, out_part: str) -> None:
    """Write ``df`` to the batch partition dir ``out_part`` —
    EXACTLY-ONCE for downstream file-source consumers.

    A plain overwrite on crash-replay would be row-idempotent but not
    FILE-idempotent: overwrite emits fresh part-file names, and any
    downstream stage tailing the directory as a streaming file source
    re-consumes the rewritten batch as new data (round-7 review: the
    composed pipeline duplicated wave-2 rows at every handoff under a
    genuine marker-window replay). Since every batch transform in this
    repo is deterministic, the fix is publish-if-changed: when the
    partition already exists and holds exactly ``df``'s rows
    (order-insensitive count + bit-xor of xxhash64 over all columns),
    the replay skips the rewrite — downstream sees no new files. A
    partial/corrupt partition (crash mid-write) fails the comparison
    (or the read) and is overwritten; the sequential drain model
    (pipeline.run) guarantees downstream never consumed those partial
    files, because the crashed stage resumes before downstream runs."""
    spark = df.sparkSession
    if os.path.isdir(out_part):
        try:
            existing = spark.read.parquet(out_part).select(*df.columns)
            if _content_fp(existing) == _content_fp(df):
                return
        except Exception:
            pass  # unreadable partial write → republish
    df.write.mode("overwrite").parquet(out_part)


def _content_fp(frame: DataFrame) -> tuple:
    row = frame.select(
        F.xxhash64(*frame.columns).alias("h")
    ).agg(
        F.count("*").alias("n"), F.expr("bit_xor(h)").alias("x")
    ).first()
    return (row["n"], row["x"])


def write_marker(state_dir: str, batch_id: int, fp: dict) -> None:
    with open(_path(state_dir, batch_id), "w", encoding="utf-8") as fh:
        json.dump(fp, fh)


def _path(state_dir: str, batch_id: int) -> str:
    return os.path.join(state_dir, f"_batch-{batch_id}.done")
