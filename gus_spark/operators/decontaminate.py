"""Training-data decontamination: n-gram overlap against an eval set.

The pipeline step the public LLM reports describe (GPT-3 appendix C,
PaLM, Llama: "remove training documents sharing a 13-gram with any
benchmark example"): before training, every corpus document is checked
for verbatim token n-gram overlap with the held-out evaluation suites,
and overlapping documents are dropped (or flagged for audit).

Scale shape (the 100-TB path):
- Both sides explode to distinct token n-grams — pure map work, one
  row per distinct gram. Grams are joined by their xxhash64 (8-byte
  shuffle keys instead of ~100-byte strings; a 64-bit collision
  altering a pair's count has probability ~k²/2⁶⁴ ≈ 1e-12 at k=10⁴
  grams — the same accepted-risk class as the LSH escape bound).
- The benchmark side is an eval suite — thousands of documents, not
  the corpus — so the joined gram set is small; no broadcast is
  forced (AQE broadcasts it at runtime when it fits, and a genuinely
  huge benchmark degrades to a uniform-key shuffle equi-join, never a
  cross product).
- Aggregation is a count per (doc, bench) pair with map-side partials;
  `decontaminate` then needs only a semi/anti join on the doc id.

Documents shorter than ``n`` tokens contribute their WHOLE token
sequence as a single gram (never individual tokens — a stray "the"
must not contaminate), matching the whole-example hashing the reports
use for short benchmark items.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gus_spark.operators.util import ensure_parallelism

DEFAULT_N = 13  # the public reports' standard overlap width


def token_ngrams(text: Column, n: int = DEFAULT_N) -> Column:
    """Distinct space-joined token n-grams of ``text``; the whole
    token sequence when the document has fewer than ``n`` tokens."""
    ws = F.split(F.trim(text), r"\s+")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - (n - 1)),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    return F.array_distinct(
        F.when(F.size(ws) >= n, grams).otherwise(
            F.array(F.array_join(ws, " "))
        )
    )


def _gram_hashes(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str
) -> DataFrame:
    return df.select(
        F.col(id_col).alias(out_id),
        F.explode(token_ngrams(F.col(text_col), n)).alias("_gram"),
    ).select(out_id, F.xxhash64("_gram").alias("_gh"))


def ngram_contamination(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = DEFAULT_N,
    min_hits: int = 1,
) -> DataFrame:
    """(doc_id, bench_id, shared_ngrams) for every corpus/benchmark
    document pair sharing >= ``min_hits`` distinct token n-grams."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    if min_hits < 1:
        raise ValueError(f"min_hits must be >= 1, got {min_hits}")
    d = _gram_hashes(ensure_parallelism(docs), id_col, text_col, n, "doc_id")
    b = _gram_hashes(bench, bench_id_col, bench_text_col, n, "bench_id")
    return (
        d.join(b, "_gh")
        .groupBy("doc_id", "bench_id")
        # grams are array_distinct'd per document before the explode,
        # so plain COUNT(*) of joined rows IS the distinct-gram count
        .agg(F.count("*").alias("shared_ngrams"))
        .filter(F.col("shared_ngrams") >= min_hits)
    )


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str = "doc_id",
    bench_text_col: str = "text",
    n: int = DEFAULT_N,
    min_hits: int = 1,
) -> DataFrame:
    """``docs`` minus every document contaminated by ``bench`` — the
    anti-join a training pipeline applies before tokenization."""
    dirty = ngram_contamination(
        docs, bench, id_col, text_col, bench_id_col, bench_text_col,
        n, min_hits,
    ).select(F.col("doc_id").alias("_dirty_id")).distinct()
    return docs.join(
        dirty, docs[id_col] == F.col("_dirty_id"), "left_anti"
    )
