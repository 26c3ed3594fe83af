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

Scale shape: pure JVM column expressions — split once, slice/join per
chunk, ONE posexplode for the fan-out. Zero shuffles, whole-stage
codegen around the generator, embarrassingly parallel; output rows ≈
input tokens / step. No Python in the plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """(id, chunk_index, chunk_text, n_chunk_tokens): the sliding
    token windows of every non-null-text document."""
    if max_tokens < 1:
        raise ValueError(f"max_tokens must be >= 1, got {max_tokens}")
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"overlap must be in [0, max_tokens), got {overlap}"
        )
    step = max_tokens - overlap
    live = df.filter(F.col(text_col).isNotNull())
    toks = live.select(
        F.col(id_col), F.split(F.trim(F.col(text_col)), r"\s+").alias("_ws")
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
