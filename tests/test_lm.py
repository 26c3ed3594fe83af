"""N-gram LM perplexity (CCNet signal, Stupid Backoff) vs a
pure-Python reference: exact score parity, backoff/OOV semantics,
ranking sanity, determinism across partitionings."""

import math
import os
import re
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gus_spark.operators.lm import fit_ngram_lm, perplexity_score


# ---------------------------------------------------------------- reference
def _tok(t):
    return [w for w in re.split(r"\s+", t) if w]


def _ref_fit(texts, order):
    counts = {}
    for t in texts:
        ts = _tok(t)
        for m in range(1, order + 1):
            for i in range(len(ts) - m + 1):
                g = tuple(ts[i : i + m])
                counts[g] = counts.get(g, 0) + 1
    return counts


def _ref_score(text, counts, order, alpha=0.4):
    total = sum(c for g, c in counts.items() if len(g) == 1)
    ts = _tok(text)
    if not ts:
        return 0, None
    log_sum = 0.0
    for i in range(len(ts)):
        penalty, s = 1.0, None
        for m in range(min(order, i + 1), 0, -1):
            g = tuple(ts[i - m + 1 : i + 1])
            num = counts.get(g)
            if num is None:
                penalty *= alpha
                continue
            if m == 1:
                s = penalty * num / total
                break
            den = counts.get(tuple(ts[i - m + 1 : i]))
            if den is None:
                penalty *= alpha
                continue
            s = penalty * num / den
            break
        if s is None:
            s = penalty * (1.0 / (total + 1))
        log_sum += math.log10(s)
    return len(ts), -log_sum / len(ts)


CORPUS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown cat sleeps under the warm sun",
    "a slow green turtle walks past the quick brown fox",
    "the lazy dog sleeps while the quick fox runs",
]


def _fit_and_score(spark, fit_texts, score_texts, order):
    fit_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(fit_texts)],
        "doc_id long, text string",
    )
    lm = fit_ngram_lm(fit_df, order=order)
    score_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(score_texts)],
        "doc_id long, text string",
    )
    return {
        r["doc_id"]: (r["n_tokens"], r["log10_ppl"])
        for r in perplexity_score(
            score_df, lm, order=order
        ).collect()
    }


def test_lm_matches_reference_in_domain_and_held_out(spark):
    """Exact parity with the reference on (a) the training texts
    themselves (every gram seen — no backoff) and (b) held-out texts
    mixing seen grams, backoffs, and OOV words."""
    held_out = [
        "the quick brown fox sleeps",        # seen grams, new joins
        "zebra quantum flux unseen tokens",  # all-OOV
        "the quick brown fox jumps over the lazy dog",  # verbatim
        "",                                   # zero tokens
    ]
    counts = _ref_fit(CORPUS, 3)
    got = _fit_and_score(spark, CORPUS, CORPUS + held_out, order=3)
    for i, t in enumerate(CORPUS + held_out):
        n, ppl = _ref_score(t, counts, 3)
        assert got[i][0] == n, (i, t)
        if ppl is None:
            assert got[i][1] is None
        else:
            assert got[i][1] == pytest.approx(ppl, abs=1e-12), (i, t)


def test_lm_ranking_and_oov(spark):
    """The CCNet property: verbatim in-domain text scores LOWER
    perplexity than shuffled text, which scores lower than pure OOV
    noise — and every score is finite."""
    probes = [
        "the quick brown fox jumps over the lazy dog",  # in-domain
        "dog lazy the over jumps fox brown quick the",  # shuffled
        "xylo qwerty zorp blat fnord glip",             # OOV noise
    ]
    got = _fit_and_score(spark, CORPUS, probes, order=3)
    assert got[0][1] < got[1][1] < got[2][1]
    assert all(math.isfinite(v[1]) for v in got.values())


def test_lm_order1_is_unigram_and_validation(spark):
    counts = _ref_fit(CORPUS, 1)
    got = _fit_and_score(spark, CORPUS, ["the quick zebra"], order=1)
    n, ppl = _ref_score("the quick zebra", counts, 1)
    assert got[0] == (n, pytest.approx(ppl, abs=1e-12))
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="order"):
        fit_ngram_lm(df, order=0)
    lm = fit_ngram_lm(df, order=2)
    with pytest.raises(ValueError, match="alpha"):
        perplexity_score(df, lm, alpha=0.0)


def test_lm_partitioning_invariance(spark):
    """Counts and scores must not depend on how the corpus or the
    scored documents are partitioned (map-side counting + per-doc
    kernel are both partition-free)."""
    fit_df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS * 3)],
        "doc_id long, text string",
    )
    lm1 = fit_ngram_lm(fit_df.coalesce(1), order=2)
    lm8 = fit_ngram_lm(fit_df.repartition(8), order=2)
    assert sorted(map(tuple, lm1.collect())) == sorted(
        map(tuple, lm8.collect())
    )
    probe = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)],
        "doc_id long, text string",
    )
    s1 = {
        r["doc_id"]: r["log10_ppl"]
        for r in perplexity_score(probe.coalesce(1), lm1, order=2).collect()
    }
    s8 = {
        r["doc_id"]: r["log10_ppl"]
        for r in perplexity_score(probe.repartition(8), lm8, order=2).collect()
    }
    assert s1 == s8


def test_lm_on_documents_table(spark):
    """Fit on the real corpus and score it: full coverage, finite
    scores, and near-dup documents score close to their originals
    (they share almost all grams)."""
    from conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    lm = fit_ngram_lm(docs, order=3).cache()
    out = perplexity_score(docs, lm, order=3).collect()
    assert len(out) == 200
    assert all(
        r["log10_ppl"] is not None and math.isfinite(r["log10_ppl"])
        for r in out
        if r["n_tokens"] > 0
    )
    lm.unpersist()
