"""The training-data pipeline as ONE composed micro-batch graph:

    raw document stream
      → curation        (gates + exact dedup; persisted fp state)
      → decontamination (13-gram eval-overlap; persisted bench grams)
      → chunk + pack    (sliding windows → stateful next-fit packing)

Stages chain through file-source handoff — each stage's parquet
output directory IS the next stage's streaming source — which is the
standard way to compose independently-checkpointed micro-batch
stages: every stage keeps its own checkpoint, state and crash-replay
guarantee (curation/decontamination: done-markers + batch-keyed
overwrite; packing: the structured-streaming parquet sink's
_spark_metadata manifest gives exactly-once file commits on top of
the applyInPandasWithState (shard → open-sequence) state in the
checkpoint). A crash ANYWHERE — inside a stage, or between stages —
resumes by re-running the pipeline with the same work_dir: finished
batches short-circuit on their content-fingerprinted markers
(streaming.markers), the crashed window replays idempotently — both
row-idempotently (keyed publish) and FILE-idempotently
(markers.publish_batch, so downstream file sources never re-consume
a replayed batch as new files) — and downstream stages pick up
exactly the files the upstream stage committed. Losing a CHECKPOINT
while the source grows is not a crash but a lineage divergence; the
fingerprinted markers refuse it loudly instead of silently skipping
new data as "done". Asserted end-to-end in tests/test_streaming.py
(kill-and-resume via real commit-file surgery, output row-identical
to the batch composition; checkpoint-loss raises; re-aligned
batching recovers).

Stages run to completion IN ORDER per `run()` call (availableNow
triggers): a file-source stage only sees files committed before it
starts, so sequential execution makes each run's output deterministic
for a quiesced source. On a live source, call `run()` repeatedly (or
per arrival wave) — each pass drains what the previous stages
committed; nothing about the state model depends on the pipeline
being fully drained.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from gus_spark.operators.chunk import chunk_documents
from gus_spark.streaming.curation import _OUT_COLS, curate_stream
from gus_spark.streaming.decontaminate import decontaminate_stream
from gus_spark.streaming.packing import pack_stream


class CurationPipelineStream:
    """Wire the three streaming stages over a shared ``work_dir``.

    Layout (all under work_dir):
      curated/   stage-1 output (batch=<id> partitions, text carried)
      clean/     stage-2 output (batch=<id> partitions)
      packed/    stage-3 output (exactly-once parquet sink)
      state1/ state2/          persisted fp / bench-gram state
      ckpt1/ ckpt2/ ckpt3/     per-stage streaming checkpoints
    """

    def __init__(
        self,
        spark: SparkSession,
        src_path: str,
        src_schema: StructType,
        bench: DataFrame,
        work_dir: str,
        *,
        max_files_per_trigger: int | None = None,
        ngram: int = 13,
        min_hits: int = 1,
        chunk_tokens: int = 64,
        chunk_overlap: int = 8,
        seq_budget: int = 256,
        pack_shards: int = 16,
    ) -> None:
        self.spark = spark
        self.src_path = src_path
        self.src_schema = src_schema
        self.bench = bench
        self.work = work_dir
        self.max_files = max_files_per_trigger
        self.ngram = ngram
        self.min_hits = min_hits
        self.chunk_tokens = chunk_tokens
        self.chunk_overlap = chunk_overlap
        self.seq_budget = seq_budget
        self.pack_shards = pack_shards
        self.curated = os.path.join(work_dir, "curated")
        self.clean = os.path.join(work_dir, "clean")
        self.packed = os.path.join(work_dir, "packed")

    def _reader(self, path: str, schema: StructType):
        r = self.spark.readStream.schema(schema)
        if self.max_files is not None:
            r = r.option("maxFilesPerTrigger", self.max_files)
        return r.parquet(path)

    def run_curate(self) -> None:
        """Stage 1: gates + exact dedup, text carried for downstream."""
        stream = self._reader(self.src_path, self.src_schema)
        curate_stream(
            stream,
            os.path.join(self.work, "state1"),
            self.curated,
            os.path.join(self.work, "ckpt1"),
            include_text=True,
        ).awaitTermination()

    def _curated_schema(self) -> StructType:
        # the stage-1 contract columns + text + the batch partition key
        df = self.spark.read.parquet(self.curated)
        return df.select(*_OUT_COLS, "text", "batch").schema

    def run_decontaminate(self) -> None:
        """Stage 2: 13-gram eval-overlap anti-join over the curated
        stream. No-op (vacuously complete) until stage 1 committed
        anything."""
        if not os.path.isdir(self.curated):
            return
        stream = self._reader(self.curated, self._curated_schema())
        decontaminate_stream(
            stream.drop("batch"),
            self.bench,
            os.path.join(self.work, "state2"),
            self.clean,
            os.path.join(self.work, "ckpt2"),
            n=self.ngram,
            min_hits=self.min_hits,
        ).awaitTermination()

    def run_pack(self) -> None:
        """Stage 3: sliding-window chunking (stateless, fuses into the
        micro-batch scan) → stateful next-fit packing → exactly-once
        parquet sink."""
        if not os.path.isdir(self.clean):
            return
        # include the batch partition key in the declared schema and
        # drop it ON THE STREAM (the run_decontaminate form): omitting
        # a partition column from a user schema doesn't exclude it —
        # Spark re-appends it to the reader output
        schema = self.spark.read.parquet(self.clean).schema
        stream = self._reader(self.clean, schema).drop("batch")
        chunks = chunk_documents(
            stream,
            max_tokens=self.chunk_tokens,
            overlap=self.chunk_overlap,
        )
        packed = pack_stream(
            chunks, budget=self.seq_budget, shards=self.pack_shards
        )
        (
            packed.writeStream.format("parquet")
            .option("path", self.packed)
            .option(
                "checkpointLocation", os.path.join(self.work, "ckpt3")
            )
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )

    def run(self) -> None:
        """Drain the whole pipeline once: each stage runs to completion
        (availableNow) before the next reads its committed files."""
        self.run_curate()
        self.run_decontaminate()
        self.run_pack()
