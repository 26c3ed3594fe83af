"""Streaming sequence packing: the next-fit packer (operators.chunk.
pack_sequences) as a stateful streaming operator.

A training-data firehose wants chunks packed into fixed-token-budget
sequences AS THEY ARRIVE — the batch packer's per-shard scan maps
directly onto ``applyInPandasWithState``: the state per shard is the
open sequence's (seq_id, fill), carried across micro-batches, so a
sequence started in one batch keeps filling in the next. No built-in
streaming operator can express this (it needs running state that both
numbers and gates rows while passing them through — the
per_key_quota_stream shape with arithmetic).

Semantics vs the batch packer: within a micro-batch the scan sorts by
(doc, chunk_index) exactly like the batch op, so a single-batch run
assigns IDENTICAL (shard, seq_id) pairs; across batches the order is
arrival order (a stream cannot sort the future), which is the
standard streaming-packer contract. The budget guarantee is global:
no sequence — including ones spanning batches — ever exceeds
``budget`` (tested).

Scale shape: the only shuffle is the groupBy on the shard key; state
is ONE (long, long) tuple per shard — bounded by ``shards`` forever,
no timeout needed. Output rows carry (seq_id, fill_after); final
per-sequence totals are a downstream groupBy max(fill_after), since a
stream cannot know an open sequence's final fill.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

_STATE_SCHEMA = StructType(
    [StructField("seq", LongType()), StructField("fill", LongType())]
)


def pack_stream(
    chunks: DataFrame,
    id_col: str = "doc_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_chunk_tokens",
    budget: int = 2048,
    shards: int = 256,
) -> DataFrame:
    """Streaming next-fit packing of a chunk stream; returns the input
    columns plus (shard, seq_id, fill_after)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    sharded = chunks.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    )
    out_schema = StructType(
        sharded.schema.fields
        + [
            StructField("seq_id", LongType()),
            StructField("fill_after", LongType()),
        ]
    )

    def _pack(key, pdf_iter, state: GroupState):
        import pandas as pd

        seq, fill = state.get if state.exists else (0, 0)
        # a shard group larger than the Arrow batch size arrives as
        # SEVERAL pdfs: concatenate before the one sort, or the scan
        # order would be per-pdf-sorted only and a doc's chunk k+1
        # could pack before its chunk k (and batch parity would break
        # exactly at scale)
        pdfs = list(pdf_iter)
        if pdfs:
            pdf = pd.concat(pdfs, ignore_index=True).sort_values(
                [id_col, index_col]
            ).reset_index(drop=True)
            seq_ids, fills = [], []
            for t in pdf[tokens_col]:
                t = int(t)
                if t > budget:
                    raise ValueError(
                        f"chunk of {t} tokens exceeds budget {budget}"
                    )
                if fill + t > budget:
                    seq += 1
                    fill = 0
                fill += t
                seq_ids.append(seq)
                fills.append(fill)
            yield pdf.assign(seq_id=seq_ids, fill_after=fills)
        state.update((seq, fill))

    return sharded.groupBy("shard").applyInPandasWithState(
        _pack,
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
