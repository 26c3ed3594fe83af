"""Exact-substring dedup (Lee et al. ExactSubstr, token-gram form) vs
a pure-Python reference: identical cleaned text and cut statistics on
planted boilerplate and on random corpora; canonical-copy and
span-merge semantics pinned."""

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gus_spark.operators.substring import exact_substring_dedup


# ---------------------------------------------------------------- reference
def _ref_tokenize(t):
    return [w for w in re.split(r"\s+", t) if w]


def _ref_exact_substring(docs, k, min_count=2):
    """docs: {doc_id: text}. Mirrors the operator's documented policy:
    gram occurrences counted corpus-wide BY TOKEN CONTENT, canonical =
    lowest (doc_id, pos) per gram, a token is cut iff inside any
    non-canonical duplicated window; spans = merged islands."""
    toks = {d: _ref_tokenize(t) for d, t in docs.items()}
    occ = {}
    for d in sorted(toks):
        ts = toks[d]
        for i in range(len(ts) - k + 1):
            occ.setdefault(tuple(ts[i : i + k]), []).append((d, i))
    cut_starts = {d: [] for d in toks}
    for gram, places in occ.items():
        if len(places) < min_count:
            continue
        canon = min(places)
        for d, i in places:
            if (d, i) != canon:
                cut_starts[d].append(i)
    out = {}
    for d, ts in toks.items():
        spans = []
        for s in sorted(set(cut_starts[d])):
            if spans and s <= spans[-1][1]:
                spans[-1][1] = max(spans[-1][1], s + k)
            else:
                spans.append([s, s + k])
        drop = {i for a, b in spans for i in range(a, b)}
        kept = [t for i, t in enumerate(ts) if i not in drop]
        out[d] = (
            " ".join(kept), len(ts), len(ts) - len(kept), len(spans)
        )
    return out


def _run(spark, docs, k, min_count=2):
    df = spark.createDataFrame(
        [(d, t) for d, t in docs.items()], "doc_id long, text string"
    )
    return {
        r["doc_id"]: (
            r["text"], r["n_tokens"], r["n_cut_tokens"], r["n_cut_spans"]
        )
        for r in exact_substring_dedup(
            df, k=k, min_count=min_count
        ).collect()
    }


def test_exact_substring_planted_boilerplate(spark):
    """The motivating case document-level dedup cannot catch: distinct
    documents sharing one boilerplate passage. The canonical (lowest
    doc_id) copy survives; every other copy is cut as one span."""
    boiler = "this content is licensed under the corpus license terms"
    docs = {
        0: f"alpha beta gamma {boiler} delta epsilon",
        1: f"unrelated words entirely {boiler} and a different tail",
        2: f"{boiler} leading occurrence third document body text",
        3: "no shared passage at all in this document whatsoever",
    }
    k = len(boiler.split())
    got = _run(spark, docs, k=k)
    want = _ref_exact_substring(docs, k=k)
    assert got == want
    # doc 0 holds the canonical copy: nothing cut there
    assert got[0][2] == 0 and boiler in got[0][0]
    # docs 1 and 2 lost exactly the boilerplate (one span, k tokens)
    for d in (1, 2):
        assert got[d][2] >= k and got[d][3] == 1
        assert boiler not in got[d][0]
    assert got[3][2] == 0


def test_exact_substring_within_doc_and_overlaps(spark):
    """Within-document repetition: overlapping duplicated windows
    merge into one span, and the canonical window survives only where
    no other cut window overlaps it (removal wins — the documented
    policy)."""
    docs = {
        7: "x y z q " * 4 + "tail marker",  # 'x y z q' repeated 4x
        8: "completely different filler content here",
    }
    got = _run(spark, docs, k=4)
    want = _ref_exact_substring(docs, k=4)
    assert got == want
    # the repeated block collapses; the tail survives
    assert "tail marker" in got[7][0]
    assert got[7][3] >= 1 and got[7][2] > 0


def test_exact_substring_short_docs_and_validation(spark):
    import pytest

    docs = {1: "a b c", 2: "a b c"}  # 3 tokens < k: no grams, no cuts
    got = _run(spark, docs, k=5)
    assert got[1] == ("a b c", 3, 0, 0) and got[2] == ("a b c", 3, 0, 0)
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="k must"):
        exact_substring_dedup(df, k=1)
    with pytest.raises(ValueError, match="min_count"):
        exact_substring_dedup(df, k=2, min_count=1)


def test_exact_substring_random_corpora_reference_parity(spark):
    """Property form: random small-vocabulary corpora (heavy repeats)
    must match the pure-Python reference exactly — text, token counts,
    cut counts, span counts — across several k values."""
    import random

    rng = random.Random(0x5EB)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(6):
        docs = {
            d: " ".join(
                rng.choice(vocab) for _ in range(rng.randrange(5, 40))
            )
            for d in range(rng.randrange(2, 6))
        }
        k = rng.choice([2, 3, 4])
        got = _run(spark, docs, k=k)
        want = _ref_exact_substring(docs, k=k)
        assert got == want, (trial, k, docs)


def test_exact_substring_on_documents_table(spark):
    """On the real corpus: every row returns, cut stats are
    consistent (cut <= total, spans>0 iff cut>0), and rebuilt token
    counts add up."""
    from conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(300)
    out = exact_substring_dedup(docs, k=8).collect()
    assert len(out) == 300
    for r in out:
        assert 0 <= r["n_cut_tokens"] <= r["n_tokens"]
        assert (r["n_cut_spans"] > 0) == (r["n_cut_tokens"] > 0)
        assert len(r["text"].split()) == r["n_tokens"] - r["n_cut_tokens"]
