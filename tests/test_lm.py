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


# ------------------------------------------------- CCNet bucket assignment
class TestPerplexityBuckets:
    """perplexity_buckets: CCNet head/middle/tail per language —
    exact-tier DuckDB bit-parity (rational integer cuts, boundary
    rows included), CCNet tertile sizes, approx-tier adjacency-bounded
    agreement, null routing, plan shapes, cut-spec validation."""

    def _scored(self, spark, n=400, langs=("en", "de", "fr")):
        # deterministic synthetic scores with planted TIES (ppl
        # rounded to 2 decimals) so the id tie-break is exercised,
        # null-score rows (zero-token docs), and NULL-lang rows (a
        # legitimate group both tiers must keep — the approx join is
        # null-safe)
        rows = [
            (
                i,
                None if i % 53 == 0 else langs[i % len(langs)],
                None if i % 97 == 0 else round(((i * 37) % 100) / 25.0, 2),
            )
            for i in range(n)
        ]
        return spark.createDataFrame(
            rows, "doc_id long, lang string, log10_ppl double"
        )

    def test_exact_matches_duckdb_twin(self, spark):
        import duckdb

        from gus_spark.operators.lm import (
            perplexity_buckets,
            sql_perplexity_buckets,
        )
        from oracle_harness import frame_key

        scored = self._scored(spark)
        got = perplexity_buckets(scored).toPandas()
        con = duckdb.connect()
        con.register("scored", scored.toPandas())
        want = con.execute(sql_perplexity_buckets("scored")).df()
        assert frame_key(got) == frame_key(want)

    def test_ccnet_tertiles_and_null_routing(self, spark):
        import math

        from gus_spark.operators.lm import perplexity_buckets

        scored = self._scored(spark)
        out = perplexity_buckets(scored).collect()
        assert len(out) == scored.count()
        by_lang = {}
        for r in out:
            if r.log10_ppl is None:
                assert r.bucket is None
                continue
            by_lang.setdefault(r.lang, []).append(r)
        for lang, rows in by_lang.items():
            n = len(rows)
            counts = {"head": 0, "middle": 0, "tail": 0}
            for r in rows:
                counts[r.bucket] += 1
            # rank*3 <= n*1 -> head size floor(n/3); <= n*2 -> 2n/3
            assert counts["head"] == math.floor(n / 3), lang
            assert counts["head"] + counts["middle"] == math.floor(
                2 * n / 3
            ), lang
            # the head really is the low-perplexity end
            worst_head = max(
                r.log10_ppl for r in rows if r.bucket == "head"
            )
            best_tail = min(
                r.log10_ppl for r in rows if r.bucket == "tail"
            )
            assert worst_head <= best_tail

    def test_approx_agrees_up_to_adjacency(self, spark):
        from gus_spark.operators.lm import perplexity_buckets

        scored = self._scored(spark)
        exact = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(scored, tier="exact").collect()
        }
        approx = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(scored, tier="approx").collect()
        }
        assert set(exact) == set(approx)  # incl. every NULL-lang row
        order = {"head": 0, "middle": 1, "tail": 2}
        n_live = sum(1 for b in exact.values() if b is not None)
        disagree = 0
        for k, eb in exact.items():
            ab = approx[k]
            assert (eb is None) == (ab is None)
            if eb is not None and eb != ab:
                disagree += 1
                # thresholds are monotone: only adjacent buckets differ
                assert abs(order[eb] - order[ab]) == 1, (k, eb, ab)
        # sketch error is rank-bounded; at accuracy 10k on 400 rows
        # only tie-straddling cut rows can move
        assert disagree / n_live < 0.15

    def test_plan_shapes(self, spark):
        import contextlib
        import io
        import re as _re

        from gus_spark.operators.lm import perplexity_buckets

        def plan_of(df):
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain(mode="formatted")
            return buf.getvalue()

        scored = self._scored(spark)
        p_exact = plan_of(perplexity_buckets(scored, tier="exact"))
        assert len(_re.findall(r"\(\d+\) Exchange\b", p_exact)) == 1
        p_approx = plan_of(perplexity_buckets(scored, tier="approx"))
        # the scale tier never sorts: thresholds pay their one agg
        # exchange ONCE at artifact build (checked_artifact's
        # checkpoint, r11 — the labeling plan reads the materialized
        # artifact as an ExistingRDD), so the assignment plan itself
        # is a broadcast-joined pure map with ZERO exchanges
        assert "Sort" not in p_approx, p_approx
        assert len(_re.findall(r"\(\d+\) Exchange\b", p_approx)) == 0
        assert "ExistingRDD" in p_approx, p_approx

    def test_cut_spec_validation(self, spark):
        import pytest as _pytest

        from gus_spark.operators.lm import perplexity_buckets

        scored = self._scored(spark, n=30)
        with _pytest.raises(ValueError, match="labels"):
            perplexity_buckets(scored, labels=("a", "b"))
        with _pytest.raises(ValueError, match="ascending"):
            perplexity_buckets(
                scored, cuts=((2, 3), (1, 3)), labels=("a", "b", "c")
            )
        with _pytest.raises(ValueError, match="num, den"):
            perplexity_buckets(
                scored, cuts=((3, 3),), labels=("a", "b")
            )
        with _pytest.raises(ValueError, match="tier"):
            perplexity_buckets(scored, tier="banana")

    def test_composes_with_real_scores(self, spark):
        """End-to-end CCNet shape on the corpus: fit, score, join
        lang back, bucket — full coverage, per-lang head is the
        lowest-perplexity third."""
        from conftest import SF_DIR
        from pyspark.sql import functions as F

        from gus_spark.operators.lm import (
            fit_ngram_lm,
            perplexity_buckets,
            perplexity_score,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(
            150
        )
        lm = fit_ngram_lm(docs, order=2).cache()
        scored = perplexity_score(docs, lm, order=2).join(
            docs.select("doc_id", "lang"), "doc_id"
        )
        out = perplexity_buckets(scored).collect()
        lm.unpersist()
        assert len(out) == 150
        assert {r.bucket for r in out if r.log10_ppl is not None} <= {
            "head", "middle", "tail",
        }
        langs = {r.lang for r in out}
        assert langs  # lang survived the composition

    def test_frozen_thresholds_label_a_stream(self, spark, tmp_path):
        """perplexity_thresholds -> assign_buckets is the CCNet
        serving shape: thresholds fit ONCE (a row per language),
        then labeling is a pure broadcast map — identical to the
        fused approx tier on the fit corpus, NULL for languages the
        fit never saw, and safe inside foreachBatch (no window, no
        state): a streamed micro-batch labels bit-identically to the
        batch map."""
        from pyspark.sql import functions as F

        from gus_spark.operators.lm import (
            assign_buckets,
            perplexity_buckets,
            perplexity_thresholds,
        )

        scored = self._scored(spark)
        thresholds = perplexity_thresholds(scored)
        want = {
            r.doc_id: r.bucket
            for r in assign_buckets(scored, thresholds).collect()
        }
        fused = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(scored, tier="approx").collect()
        }
        assert want == fused
        # a language outside the fit has no defined distribution
        alien = spark.createDataFrame(
            [(9999, "xx", 1.5)],
            "doc_id long, lang string, log10_ppl double",
        )
        assert (
            assign_buckets(alien, thresholds).first().bucket is None
        )
        # stream the scored frame through foreachBatch with the
        # FROZEN thresholds
        src = str(tmp_path / "scored_src")
        scored.repartition(2).write.parquet(src)
        out_dir = str(tmp_path / "labeled")
        schema = spark.read.parquet(src).schema

        def label(batch_df, batch_id):
            assign_buckets(batch_df, thresholds).write.mode(
                "overwrite"
            ).parquet(f"{out_dir}/batch={batch_id}")

        q = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(label)
            .option(
                "checkpointLocation", str(tmp_path / "ckpt")
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            r.doc_id: r.bucket
            for r in spark.read.parquet(out_dir).collect()
        }
        assert got == want


def test_assign_buckets_duplicated_artifact_is_loud(spark):
    """A duplicated thresholds artifact (e.g. a refit appended next
    to the old one) must raise, never silently multiply scored rows
    through the broadcast join (r11, shared checked_artifact)."""
    import pytest

    from gus_spark.operators.lm import (
        assign_buckets,
        perplexity_thresholds,
    )

    scored = spark.createDataFrame(
        [(i, "en", 2.0 + i / 10.0) for i in range(30)],
        "doc_id long, lang string, log10_ppl double",
    )
    thr = perplexity_thresholds(scored)
    with pytest.raises(ValueError, match="one row per key"):
        assign_buckets(scored, thr.unionByName(thr)).collect()
