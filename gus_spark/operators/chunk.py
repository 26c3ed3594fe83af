"""Document chunking for training pipelines: split long documents into
token-bounded, optionally-overlapping chunks.

The step between tokenization and sequence packing in every LLM data
pipeline: documents longer than the context budget are cut into
windows of ``max_tokens`` whitespace tokens with ``overlap`` tokens of
continuity between consecutive windows (overlap preserves context at
the cut, the standard sliding-window recipe).

Chunk arithmetic (1-based token positions, step = max_tokens −
overlap):

    n_chunks = max(ceil((n_tokens − overlap) / step), 1)
    chunk i  = tokens[1 + i·step : +max_tokens]   (i = 0..n_chunks−1)

— every token is covered, consecutive chunks share exactly
``overlap`` tokens (except a shorter final chunk), and a document
within budget yields itself as one chunk.

`pack_sequences` is the companion step: assign the chunks to
fixed-token-budget training sequences (greedy sequential NEXT-fit
within deterministic shards — the order-preserving packing recipe:
a sequence, once closed, is never revisited),
reporting per-sequence fill so the pipeline can grade packing
efficiency.

Scale shape: chunking is pure JVM column expressions — split once,
slice/join per chunk, ONE posexplode for the fan-out; zero shuffles,
whole-stage codegen around the generator, output rows ≈ input
tokens / step. Packing adds exactly ONE shuffle (the shard key) into
an applyInPandas kernel whose per-shard work is a linear scan — the
sequential dependency of the packing scan is confined to a shard,
which is how production packers parallelize it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gus_spark.functions.tokenize import tokenize


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_index, chunk_text, n_chunk_tokens): the sliding
    token windows of every document with at least one token — null and
    empty/whitespace-only documents yield ZERO chunks, and empty-string
    split artifacts are filtered from the token array (Spark trim()
    strips only ASCII spaces, so '\\n'-padded text otherwise yields
    phantom '' tokens that would inflate n_chunk_tokens and enter
    training sequences)."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    step = max_tokens - overlap
    tokens = tokenize(F.col(text_col), "words")
    toks = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens.alias("_ws"))
        .filter(F.size("_ws") > 0)
    )
    size = F.size("_ws")
    n_chunks = F.greatest(
        F.ceil((size - F.lit(overlap)) / F.lit(step)), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.slice(F.col("_ws"), i * step + 1, max_tokens),
    )
    return (
        toks.select(
            F.col(id_col),
            F.posexplode(chunks).alias("chunk_index", "_chunk"),
        )
        .select(
            F.col(id_col),
            "chunk_index",
            F.array_join("_chunk", " ").alias("chunk_text"),
            F.size("_chunk").cast("long").alias("n_chunk_tokens"),
        )
    )


def pack_sequences(
    chunks: DataFrame,
    id_col: str = "doc_id",
    index_col: str = "chunk_index",
    tokens_col: str = "n_chunk_tokens",
    budget: int = 2048,
    shards: int = 256,
) -> DataFrame:
    """Assign chunks to fixed-budget training sequences: greedy
    sequential NEXT-fit in (id, chunk_index) order within each of
    ``shards`` deterministic hash shards (a closed sequence is never
    reopened — first-fit would revisit all open bins and break the
    order-preserving contract). Returns the input columns
    plus (shard, seq_id, seq_tokens) where seq_id numbers sequences
    within a shard and seq_tokens is the packed sequence's total fill.

    Guarantees (tested): no sequence exceeds ``budget``; a document's
    chunks are assigned in chunk_index order (a sequence never holds
    chunk k+1 before k of the same doc); assignment is deterministic
    across runs and partitionings (shard = pmod(xxhash64(id), shards),
    scan order sorted). Chunks wider than the budget raise upstream —
    callers chunk with max_tokens <= budget by construction.

    The scan is inherently sequential, so the parallel unit is the
    shard: one shuffle on the shard key, then a linear pandas scan per
    shard. Packing quality is within-shard (a chunk never fills
    another shard's open sequence); next-fit's waste bound is
    per-sequence, not per-shard — every CLOSED sequence is filled past
    budget − max(chunk size) (it closed because the next chunk
    overflowed), so waste ≤ max_chunk − 1 tokens per sequence plus one
    arbitrarily-light trailing sequence per shard.
    """
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    sharded = chunks.withColumn(
        "shard", F.pmod(F.xxhash64(F.col(id_col)), F.lit(shards))
    )

    def _pack(pdf):
        pdf = pdf.sort_values([id_col, index_col]).reset_index(drop=True)
        seq_ids, seq_tokens = [], []
        cur_id, cur_fill = 0, 0
        fills: dict[int, int] = {}
        for t in pdf[tokens_col]:
            t = int(t)
            if t > budget:
                raise ValueError(
                    f"chunk of {t} tokens exceeds budget {budget}"
                )
            if cur_fill + t > budget:
                fills[cur_id] = cur_fill
                cur_id += 1
                cur_fill = 0
            seq_ids.append(cur_id)
            cur_fill += t
        fills[cur_id] = cur_fill
        seq_tokens = [fills[s] for s in seq_ids]
        return pdf.assign(seq_id=seq_ids, seq_tokens=seq_tokens)

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in sharded.schema.fields
    ) + ", seq_id long, seq_tokens long"
    return sharded.groupBy("shard").applyInPandas(_pack, schema)
