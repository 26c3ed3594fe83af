"""Exact-substring deduplication (Lee et al. 2022, arXiv 2107.06499,
"Deduplicating Training Data Makes Language Models Better" — the
ExactSubstr pass): repeated passages of ≥ k consecutive tokens
anywhere in the corpus are CUT from every document except one
canonical occurrence. Document-level dedup (exact/MinHash/SemDeDup)
cannot see boilerplate shared between otherwise-distinct documents —
licenses, navigation chrome, quoted passages — which is exactly the
duplication this pass removes.

Token-gram adaptation (the paper works on byte suffix arrays, which
don't distribute; the standard scalable re-expression is fixed-length
window hashing, the same move decontamination makes for 13-gram
eval overlap):

1. tokenize (whitespace, empty artifacts filtered — chunk/quality's
   token definition, because the CLEANED text is rebuilt by
   ``' '.join`` and must not invent empty tokens; whitespace runs are
   therefore normalized to single spaces, documented loss);
2. per doc, hash every k-token window — a degree-(k−1) polynomial in
   the JVM-computed per-token xxhash64s over Z/2^64 (numpy uint64
   wraparound), vectorized per Arrow batch; k is UNBOUNDED (the
   dedup family's rotate-xor combine caps at 8-grams, so this family
   uses its own rolling-polynomial identity);
3. one groupBy on the 64-bit gram hash: occurrence count + the
   canonical (lowest (doc_id, pos)) occurrence — uniform keys, the
   shuffle moves one row per window;
4. join occurrences of grams with count ≥ min_count back on the hash,
   drop the canonical one, and merge each document's surviving cut
   windows [pos, pos+k) into spans;
5. rebuild each document without the cut tokens (one Arrow kernel
   pass per doc).

Cut policy (deterministic, asserted against a pure-Python reference):
a token is removed iff it lies inside ANY non-canonical duplicated
window. The canonical occurrence survives only where no other cut
window overlaps it — removal wins over protection, matching the
paper's observation that cutting all-but-one copy is already an
approximation (cut boundaries create new adjacencies that can form
new k-grams; a second pass converges if needed).

Hash-collision bound: two distinct k-token windows collide with
probability ~2⁻⁶⁴ per pair (full-width polynomial over full-width
xxhash64 token hashes) — far below any corpus-scale noise floor.

Scale shape: the window explode emits ≤ one row per TOKEN (each token
starts at most one window); both shuffles (gram groupBy, gram join)
key on uniform 64-bit hashes; the rebuild shuffles cut positions on
doc_id only for documents that have cuts (typically a small
fraction). No all-pairs stage exists at any step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gus_spark.functions.tokenize import tokenize

from gus_spark.operators.util import ensure_parallelism

#: polynomial base: an odd 64-bit constant (splitmix64's increment) —
#: odd ⇒ invertible mod 2^64, so windows differing in any position
#: produce different polynomials unless a genuine 2^-64 collision.
_POLY_BASE = 0x9E3779B97F4A7C15

_CHUNK = 1 << 17  # windows hashed per numpy slice (bounds memory at k·1MB)


def _tokens_and_hashes(df: DataFrame, id_col: str, text_col: str):
    toks = tokenize(F.col(text_col), "words")
    return df.select(
        F.col(id_col).alias("_did"),
        toks.alias("_toks"),
        F.transform(toks, lambda w: F.xxhash64(w)).alias("_th"),
    )


def _window_hashes(th, k: int):
    """uint64 polynomial hash of every k-window of the int64 hash
    array ``th`` — vectorized, sliced to bound the windows×k buffer."""
    import numpy as np

    t = np.asarray(th, dtype="int64").view("uint64")
    n = t.shape[0] - k + 1
    if n <= 0:
        return np.empty(0, dtype="uint64")
    powers = np.empty(k, dtype="uint64")
    powers[k - 1] = 1
    with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
        for j in range(k - 2, -1, -1):
            powers[j] = powers[j + 1] * np.uint64(_POLY_BASE)
    out = np.empty(n, dtype="uint64")
    win = np.lib.stride_tricks.sliding_window_view(t, k)
    for lo in range(0, n, _CHUNK):
        hi = min(lo + _CHUNK, n)
        out[lo:hi] = (win[lo:hi] * powers).sum(axis=1, dtype="uint64")
    return out


def exact_substring_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """(id, text, n_tokens, n_cut_tokens, n_cut_spans): every document
    with its corpus-wide repeated ≥k-token passages cut (whitespace
    normalized to single spaces — see module docstring); documents
    shorter than k tokens pass through with zero cuts, documents with
    NULL text pass through as NULL with zero counts."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if min_count < 2:
        raise ValueError(f"min_count must be >= 2, got {min_count}")
    import pandas as pd

    base = _tokens_and_hashes(ensure_parallelism(df), id_col, text_col)

    def _occurrences(batches):
        import numpy as np

        for pdf in batches:
            dids, poss, ghs = [], [], []
            for did, th in zip(pdf["_did"], pdf["_th"]):
                if th is None:  # NULL text -> no windows
                    continue
                gh = _window_hashes(th, k)
                if gh.shape[0] == 0:
                    continue
                dids.append(np.full(gh.shape[0], did, dtype="int64"))
                poss.append(np.arange(gh.shape[0], dtype="int32"))
                ghs.append(gh.view("int64"))
            if not dids:
                yield pd.DataFrame(
                    {"_did": pd.Series([], dtype="int64"),
                     "pos": pd.Series([], dtype="int32"),
                     "gh": pd.Series([], dtype="int64")}
                )
                continue
            yield pd.DataFrame(
                {
                    "_did": np.concatenate(dids),
                    "pos": np.concatenate(poss),
                    "gh": np.concatenate(ghs),
                }
            )

    occ = base.select("_did", "_th").mapInPandas(
        _occurrences, "_did long, pos int, gh long"
    )
    dup = (
        occ.groupBy("gh")
        .agg(
            F.count("*").alias("c"),
            F.min(F.struct("_did", "pos")).alias("canon"),
        )
        .filter(F.col("c") >= min_count)
        .select("gh", "canon")
    )
    cuts = (
        occ.join(dup, "gh")
        .filter(
            ~(
                (F.col("_did") == F.col("canon._did"))
                & (F.col("pos") == F.col("canon.pos"))
            )
        )
        .groupBy("_did")
        .agg(F.sort_array(F.collect_set("pos")).alias("cut_starts"))
    )

    def _rebuild(batches):
        for pdf in batches:
            texts, n_tok, n_cut, n_spans = [], [], [], []
            for toks, starts in zip(pdf["_toks"], pdf["cut_starts"]):
                if toks is None:  # NULL text passes through as NULL
                    texts.append(None)
                    n_tok.append(0)
                    n_cut.append(0)
                    n_spans.append(0)
                    continue
                toks = list(toks)
                if starts is None or len(starts) == 0:
                    texts.append(" ".join(toks))
                    n_tok.append(len(toks))
                    n_cut.append(0)
                    n_spans.append(0)
                    continue
                spans = []
                for s in starts:  # sorted; merge [s, s+k) islands
                    if spans and s <= spans[-1][1]:
                        spans[-1][1] = max(spans[-1][1], s + k)
                    else:
                        spans.append([s, s + k])
                drop = set()
                for a, b in spans:
                    drop.update(range(a, b))
                kept = [t for i, t in enumerate(toks) if i not in drop]
                texts.append(" ".join(kept))
                n_tok.append(len(toks))
                n_cut.append(len(toks) - len(kept))
                n_spans.append(len(spans))
            yield pd.DataFrame(
                {
                    "_did": pdf["_did"],
                    "text": texts,
                    "n_tokens": pd.Series(n_tok, dtype="int64"),
                    "n_cut_tokens": pd.Series(n_cut, dtype="int64"),
                    "n_cut_spans": pd.Series(n_spans, dtype="int64"),
                }
            )

    joined = base.join(cuts, "_did", "left").select(
        "_did", "_toks", "cut_starts"
    )
    return joined.mapInPandas(
        _rebuild,
        "_did long, text string, n_tokens long, n_cut_tokens long, "
        "n_cut_spans long",
    ).withColumnRenamed("_did", id_col)
