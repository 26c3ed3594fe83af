"""Decontamination operator: n-gram overlap detection against an eval
set (operators.decontaminate) — planted-overlap recall, short-doc
whole-sequence semantics, min_hits precision knob, and the anti-join
pipeline step."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import Row

from gus_spark.operators.decontaminate import (
    decontaminate,
    ngram_contamination,
)

VOCAB = "alpha bravo charlie delta echo foxtrot golf hotel india juliet".split()


def _text(seed: int, n_tokens: int = 40) -> str:
    # deterministic pseudo-text over a small vocabulary
    return " ".join(VOCAB[(seed * 7 + i * 3) % len(VOCAB)] for i in range(n_tokens))


@pytest.fixture(scope="module")
def corpora(spark):
    bench_sentence = "zulu yankee xray whiskey victor uniform tango sierra romeo quebec papa oscar november"  # 13 tokens
    docs = [
        # 0: clean
        Row(doc_id=0, text=_text(0)),
        # 1: contains the benchmark 13-gram verbatim mid-document
        Row(doc_id=1, text=_text(1, 10) + " " + bench_sentence + " " + _text(2, 10)),
        # 2: contains 12 of the 13 tokens (no full 13-gram) — clean
        Row(doc_id=2, text=_text(3, 10) + " " + " ".join(bench_sentence.split()[:12])),
        # 3: the benchmark text verbatim twice (still ONE distinct gram per window set)
        Row(doc_id=3, text=bench_sentence + " " + bench_sentence),
        # 4: short doc (< 13 tokens), not a benchmark item — clean
        Row(doc_id=4, text="alpha bravo charlie"),
        # 5: short doc equal to a SHORT benchmark item — contaminated via whole-seq gram
        Row(doc_id=5, text="golf hotel india"),
        # 6: contains the LONG benchmark item verbatim (8 shared grams)
        Row(doc_id=6, text=_text(5, 6) + " " + " ".join(VOCAB * 2) + " " + _text(6, 6)),
    ]
    bench = [
        Row(doc_id=100, text=bench_sentence),
        Row(doc_id=101, text="golf hotel india"),  # short eval item
        Row(doc_id=102, text=" ".join(VOCAB * 2)),  # 20-token eval item
    ]
    return spark.createDataFrame(docs), spark.createDataFrame(bench)


def test_contamination_detects_planted_overlap(spark, corpora):
    docs, bench = corpora
    hits = {
        (r.doc_id, r.bench_id): r.shared_ngrams
        for r in ngram_contamination(docs, bench).collect()
    }
    # doc 1 shares the full window set of the benchmark sentence
    assert (1, 100) in hits
    # doc 3 contains it twice -> more distinct grams (the doubled text
    # spans extra windows), but at least the sentence's own 1 gram
    assert (3, 100) in hits
    # short doc == short benchmark item: whole-sequence gram matches
    assert hits[(5, 101)] == 1
    # near-miss (12 of 13 tokens), clean, and unrelated-short stay out
    assert not any(d in (0, 2, 4) for d, _b in hits)


def test_short_tokens_never_contaminate(spark, corpora):
    """A stray shared token must not flag a document: doc 4 shares
    'alpha'/'bravo'/'charlie' tokens with doc texts but no 13-gram or
    whole-short-sequence, so it is clean."""
    docs, bench = corpora
    clean_ids = {r.doc_id for r in decontaminate(docs, bench).collect()}
    assert clean_ids == {0, 2, 4}


def test_min_hits_precision_knob(spark, corpora):
    docs, bench = corpora
    # a 13-token benchmark item IS one gram, so every overlap with it
    # counts exactly 1 shared gram — min_hits=2 keeps only overlaps
    # with longer eval items (doc 6 ⊇ the 20-token item = 8 windows)
    strict = ngram_contamination(docs, bench, min_hits=2)
    pairs = {(r.doc_id, r.bench_id): r.shared_ngrams for r in strict.collect()}
    assert (5, 101) not in pairs and (1, 100) not in pairs
    assert pairs[(6, 102)] == 8


def test_validation_errors():
    with pytest.raises(ValueError, match="n must be"):
        ngram_contamination(None, None, n=0)
    with pytest.raises(ValueError, match="min_hits"):
        ngram_contamination(None, None, min_hits=0)


def test_no_cartesian_in_plan(spark, corpora):
    """The gram match must stay an equi-join — a nested-loop or
    cartesian here is the O(corpus x benchmark) failure mode."""
    import contextlib
    import io

    docs, bench = corpora
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        ngram_contamination(docs, bench).explain()
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_random_corpus_matches_python_bruteforce(spark):
    """Randomized cross-check: 40 random docs x 6 random eval items
    over a tiny vocabulary at n=3 (dense accidental overlaps), compared
    pair-for-pair and count-for-count against a pure-Python set
    brute force — catches any drift between the hash-join counting and
    true distinct-gram semantics."""
    import random

    rng = random.Random(20260814)
    vocab = "red green blue gold gray pink".split()

    def mk(n_tokens):
        return " ".join(rng.choice(vocab) for _ in range(n_tokens))

    docs = [(i, mk(rng.randint(1, 30))) for i in range(40)]
    bench = [(100 + i, mk(rng.randint(1, 12))) for i in range(6)]

    def grams(text, n=3):
        ws = text.split()
        if len(ws) < n:
            return {" ".join(ws)}
        return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}

    want = {}
    for did, dt in docs:
        for bid, bt in bench:
            shared = len(grams(dt) & grams(bt))
            if shared >= 1:
                want[(did, bid)] = shared

    d = spark.createDataFrame(docs, "doc_id long, text string")
    b = spark.createDataFrame(bench, "doc_id long, text string")
    got = {
        (r.doc_id, r.bench_id): r.shared_ngrams
        for r in ngram_contamination(d, b, n=3).collect()
    }
    assert got == want and len(want) > 0


def _edit_every_kth(text: str, k: int = 8) -> str:
    """Reformat a benchmark item: replace every k-th token, breaking
    every verbatim 13-gram while keeping unigram Jaccard high."""
    toks = text.split()
    return " ".join(
        f"EDIT{i}" if i % k == k - 1 else w for i, w in enumerate(toks)
    )


@pytest.fixture(scope="module")
def fuzzy_corpora(spark):
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(400)]
    bench_rows = [
        (b, " ".join(rng.choice(vocab) for _ in range(60)))
        for b in range(5)
    ]
    clean = [
        (100 + i, " ".join(rng.choice(vocab) for _ in range(60)))
        for i in range(20)
    ]
    # docs 0..4: reformatted copies of bench items (every 8th token
    # edited -> no 13 consecutive original tokens survive)
    dirty = [(b, _edit_every_kth(t)) for b, t in bench_rows]
    docs = spark.createDataFrame(
        dirty + clean, "doc_id long, text string"
    )
    bench = spark.createDataFrame(bench_rows, "doc_id long, text string")
    return docs, bench


def test_fuzzy_catches_what_exact_misses(spark, fuzzy_corpora):
    """The motivating case: a reformatted benchmark copy (every 8th
    token edited) shares ZERO verbatim 13-grams with the original, so
    exact decontamination keeps it — but its unigram Jaccard stays
    ~0.75+, so the fuzzy pass removes it (and keeps every clean doc)."""
    from gus_spark.operators.decontaminate import (
        decontaminate,
        decontaminate_fuzzy,
        fuzzy_contamination,
    )

    docs, bench = fuzzy_corpora
    exact_kept = set(
        r.doc_id for r in decontaminate(docs, bench, n=13).collect()
    )
    assert {0, 1, 2, 3, 4} <= exact_kept  # exact pass misses all five

    # AT DEFAULTS (n=1, threshold=0.7): the calibration rule says
    # every-8th-token edits sit at J ~ (8-1)/(8+1) ~ 0.78 > 0.7, so
    # the default-parameter call must catch all five — this pins that
    # the shipped defaults actually serve the documented purpose
    pairs = fuzzy_contamination(docs, bench).toPandas()
    assert set(pairs["doc_id"]) == {0, 1, 2, 3, 4}
    # each reformatted copy matches its own original
    assert all(pairs["doc_id"] == pairs["bench_id"])
    assert (pairs["jaccard"] >= 0.7).all() and (pairs["jaccard"] < 1).all()

    fuzzy_kept = set(
        r.doc_id for r in decontaminate_fuzzy(docs, bench).collect()
    )
    assert fuzzy_kept == {100 + i for i in range(20)}


def test_fuzzy_no_cartesian_and_validates(spark, fuzzy_corpora):
    from gus_spark.operators.decontaminate import fuzzy_contamination

    import contextlib
    import io

    docs, bench = fuzzy_corpora
    df = fuzzy_contamination(docs, bench, threshold=0.6, ngram=1)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan, plan
    with pytest.raises(ValueError):
        fuzzy_contamination(docs, bench, threshold=0.0)


def test_calibration_guard(spark):
    """calibrate_fuzzy_ngram's two escalation criteria (the r10 sf1
    lesson): (a) a corpus-wide tiny vocabulary escalates via the
    banding-collision budget (every pair band-collides at n=1); (b) a
    BIMODAL background — disjoint vocabulary pools, so the MEAN
    cross-pair Jaccard is low but same-pool pairs exceed the
    verification threshold outright — escalates via the match-rate
    budget (before the fix this regime passed n=1 and fuzzy
    decontamination mass-dropped unrelated documents: half the sf1
    pipeline corpus); (c) a background with genuinely low pairwise
    overlap calibrates to the standard n=1."""
    from gus_spark.operators.decontaminate import (
        calibrate_fuzzy_ngram,
        fuzzy_contamination,
    )

    # (a) one 10-word vocabulary shared by everything: unigram sets
    # saturate, the collision criterion escalates (the original guard)
    docs_a = spark.createDataFrame(
        [(i, _text(i)) for i in range(60)], "doc_id bigint, text string"
    )
    bench_a = spark.createDataFrame(
        [(1000 + i, _text(i + 7)) for i in range(30)],
        "doc_id bigint, text string",
    )
    assert calibrate_fuzzy_ngram(docs_a, bench_a) >= 2

    # (b) ten disjoint 20-word pools (the make_sf1 word-salt shape):
    # cross-pool J = 0, same-pool unigram J = 1.0 (all docs hold the
    # full pool), so mean-J sails under the collision budget while a
    # tenth of the background already beats the 0.7 verification
    # threshold. Strides are coprime to 20 so every doc covers its
    # pool; corpus and bench strides are disjoint so same-pool
    # BIGRAM sets differ and n=2 is genuinely clean.
    pools = [[f"p{p}w{w}" for w in range(20)] for p in range(10)]

    def ptext(pool, stride):
        return " ".join(pool[(j * stride) % 20] for j in range(40))

    c_strides, b_strides = [1, 3, 7, 9], [11, 13, 17, 19]
    docs_b = spark.createDataFrame(
        [
            (i, ptext(pools[i % 10], c_strides[(i // 10) % 4]))
            for i in range(100)
        ],
        "doc_id bigint, text string",
    )
    bench_b = spark.createDataFrame(
        [
            (1000 + i, ptext(pools[i % 10], b_strides[(i // 10) % 4]))
            for i in range(50)
        ],
        "doc_id bigint, text string",
    )
    n = calibrate_fuzzy_ngram(docs_b, bench_b)
    assert n >= 2
    # the disaster the new criterion prevents, made concrete: at n=1
    # the verification itself flags a flood of unrelated same-pool
    # docs; at the calibrated width it flags nothing
    flagged_1 = (
        fuzzy_contamination(docs_b, bench_b, ngram=1)
        .select("doc_id").distinct().count()
    )
    flagged_n = (
        fuzzy_contamination(docs_b, bench_b, ngram=n)
        .select("doc_id").distinct().count()
    )
    assert flagged_1 >= 50, flagged_1
    assert flagged_n == 0, flagged_n

    # (c) low-overlap background: per-doc disjoint vocabularies ->
    # J ~ 0 everywhere, the standard n=1 stands
    docs_c = spark.createDataFrame(
        [
            (i, " ".join(f"d{i}w{j}" for j in range(30)))
            for i in range(40)
        ],
        "doc_id bigint, text string",
    )
    bench_c = spark.createDataFrame(
        [
            (1000 + i, " ".join(f"b{i}w{j}" for j in range(30)))
            for i in range(20)
        ],
        "doc_id bigint, text string",
    )
    assert calibrate_fuzzy_ngram(docs_c, bench_c) == 1
