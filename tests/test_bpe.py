"""BPE tokenizer training/encoding vs a pure-Python Sennrich
reference: identical merge lists (deterministic tie-breaks), identical
encodings, character fallback on unseen words, and the fit's
vocab-not-corpus scale contract."""

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gus_spark.operators.bpe import EOW, bpe_encode, bpe_fit, word_counts


# ---------------------------------------------------------------- reference
def _ref_symbols(word):
    chars = list(word)
    chars[-1] = chars[-1] + EOW
    return chars


def _ref_merge_all(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _ref_fit(texts, num_merges):
    vocab = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip(), flags=re.ASCII):
            if w:
                vocab[w] += 1
    words = {w: _ref_symbols(w) for w in vocab}
    merges = []
    for _ in range(num_merges):
        pairs = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += vocab[w]
        if not pairs:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        words = {w: _ref_merge_all(s, a, b) for w, s in words.items()}
    return merges


def _ref_encode(text, merges):
    ranks = {p: r for r, p in enumerate(merges)}
    toks = []
    for w in re.split(r"\s+", text.strip(), flags=re.ASCII):
        if not w:
            continue
        syms = _ref_symbols(w)
        while len(syms) >= 2:
            ranked = [
                (ranks[(syms[i], syms[i + 1])], i)
                for i in range(len(syms) - 1)
                if (syms[i], syms[i + 1]) in ranks
            ]
            if not ranked:
                break
            _, i = min(ranked)
            syms = _ref_merge_all(syms, syms[i], syms[i + 1])
        toks.extend(syms)
    return toks


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the lowest newest widest low",
]


def test_bpe_fit_matches_reference(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    got = bpe_fit(df, num_merges=12)
    want = _ref_fit(CORPUS, 12)
    assert got == want
    # the classic example: 'newest' family drives early merges toward
    # 'est</w>' pieces
    flat = ["".join(p) for p in got]
    assert any("est" in s for s in flat)


def test_bpe_encode_matches_reference_and_falls_back(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    merges = bpe_fit(df, num_merges=10)
    probe = spark.createDataFrame(
        [
            (0, "low lowest newest"),
            (1, "zzz unseen"),          # unseen words -> char fallback
            (2, ""),
            (3, None),                   # dropped
            (4, "  low   newest  "),     # whitespace runs
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: list(r["tokens"]) for r in
           bpe_encode(probe, merges).collect()}
    for i, t in [(0, "low lowest newest"), (1, "zzz unseen"), (2, ""),
                 (4, "  low   newest  ")]:
        assert out[i] == _ref_encode(t, merges), i
    assert 3 not in out
    # unseen word decomposed to (mostly) characters
    assert len(out[1]) >= 6
    # round-trip property: concatenating tokens and splitting on the
    # sentinel reconstructs the exact word sequence
    rebuilt = "".join(out[0]).replace(EOW, " ").split()
    assert rebuilt == ["low", "lowest", "newest"]


def test_bpe_fit_on_vocab_not_corpus(spark):
    """Scale contract: fit statistics depend only on the word-count
    multiset — duplicating every document must not change the merges
    beyond frequency scaling (identical merge list), and word_counts
    is the only corpus-sized aggregation."""
    df1 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    df2 = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS * 3)],
        "doc_id long, text string",
    )
    assert bpe_fit(df1, num_merges=8) == bpe_fit(df2, num_merges=8)
    wc = {r["word"]: r["count"] for r in word_counts(df1).collect()}
    assert wc["low"] == 6 and wc["newest"] == 7


def test_bpe_early_stop_and_validation(spark):
    import pytest

    df = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    # no pair ever repeats -> early stop with no merges
    assert bpe_fit(df, num_merges=5) == []
    with pytest.raises(ValueError, match="num_merges"):
        bpe_fit(df, num_merges=0)


def test_bpe_property_random_corpora(spark):
    """Property form of the reference parity: random small corpora
    (repeated short words over a tiny alphabet force real merges) must
    yield the reference's exact merge list AND encodings at every
    checkpoint cadence — pinning cadence-independence of the fit."""
    import random

    rng = random.Random(0xB9E)
    vocab = ["ab", "abc", "abab", "ba", "cab", "aabb", "b", "ccc"]
    for trial in range(12):
        texts = [
            " ".join(
                rng.choice(vocab)
                for _ in range(rng.randrange(1, 13))
            )
            for _ in range(rng.randrange(2, 7))
        ]
        num_merges = rng.randrange(1, 11)
        cadence = rng.choice([1, 3, 8])
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)],
            "doc_id long, text string",
        )
        got = bpe_fit(df, num_merges=num_merges, checkpoint_every=cadence)
        want = _ref_fit(texts, num_merges)
        assert got == want, (trial, texts, num_merges, cadence)
        enc = {
            r["doc_id"]: list(r["tokens"])
            for r in bpe_encode(df, got).collect()
        }
        for i, t in enumerate(texts):
            assert enc[i] == _ref_encode(t, got), (trial, i, t)


def test_bpe_checkpoint_every_validation(spark):
    import pytest

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    for bad in (0, 33):
        with pytest.raises(ValueError, match="checkpoint_every"):
            bpe_fit(df, num_merges=1, checkpoint_every=bad)
