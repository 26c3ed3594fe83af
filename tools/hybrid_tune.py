"""Fusion-weight tuning for hybrid RRF: pick w_dense (and w_phrase)
per corpus by holdout MRR — the loop that closes hybrid_grade's
measurement (unweighted RRF pays a textbook dilution when one tier
dominates; a tier weight recovers it) into a SETTING.

Protocol (deterministic, seeded — the hybrid_grade task):
- Q query docs are their own relevance targets; query terms are three
  mid-document tokens, query vectors the target embedding mixed with
  seeded unit noise at level alpha (alpha=1 → dense trivially right,
  alpha→0 → dense dissolves: sweeping alpha sweeps the tier-balance
  REGIME the weight must adapt to).
- Queries split by parity into a TUNE half and a HOLDOUT half; the
  grid is swept on tune-MRR only, the winner is quoted on holdout
  MRR — the quoted number never touched the selection.
- The sweep itself is pure Python over the tiers' rank lists: RRF is
  a deterministic function of (per-tier ranks, weights), so each
  tier's Spark retrieval runs ONCE per regime and the |grid| fusions
  cost microseconds each. One Spark `hybrid_rrf_batch` run at the
  chosen weight cross-checks that the Python fusion and the engine
  fusion pick identical target ranks (engine parity with the sweep,
  asserted on every run and in tests/test_hybrid_tune.py).

At 100 TB the same loop runs unchanged: tier rank lists for a few
hundred holdout queries are k_each-bounded rows regardless of corpus
size — tuning cost is retrieval cost, the sweep is free.

Run: python tools/hybrid_tune.py [sf_dir] (default testdata sf0.01)
One JSON line per regime: chosen w_dense, tune/holdout MRR for
unweighted vs tuned, and the engine cross-check.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

Q = 50
K = 100
#: regimes: dense-dominant, mixed, sparse-dominant
ALPHAS = (1.0, 0.3, 0.1)
#: the w_dense grid; 1.0 = unweighted RRF is always a candidate, so
#: the tuned pick can never lose to unweighted ON THE TUNE HALF
GRID = (0.25, 0.5, 1.0, 2.0, 3.0, 5.0)
RRF_K = 60


def rrf_fuse_py(
    tier_ranks: dict[str, dict[int, dict[int, int]]],
    weights: dict[str, float],
    rrf_k: int = RRF_K,
) -> dict[int, list[int]]:
    """Pure-Python RRF: tier -> {query -> {doc -> rank}} fused to
    {query -> [doc ids best-first]} with the engine's exact tie-break
    (score desc, doc id asc). Contributions added in sorted tier-name
    order — the engine's fold order — so scores match bit-for-bit."""
    queries = set()
    for per_q in tier_ranks.values():
        queries |= set(per_q)
    fused = {}
    for q in queries:
        scores: dict[int, float] = {}
        for tier in sorted(tier_ranks):
            w = weights.get(tier, 1.0)
            for doc, rank in tier_ranks[tier].get(q, {}).items():
                c = 1.0 / (float(rrf_k) + float(rank))
                c = c if w == 1.0 else float(w) * c
                scores[doc] = scores.get(doc, 0.0) + c
        fused[q] = [
            d for d, _s in sorted(
                scores.items(), key=lambda kv: (-kv[1], kv[0])
            )
        ]
    return fused


def mrr_of(
    fused: dict[int, list[int]],
    targets: dict[int, int],
    qids,
    k: int = K,
) -> float:
    total = 0.0
    for q in qids:
        ranking = fused.get(q, [])[:k]
        t = targets[q]
        if t in ranking:
            total += 1.0 / (ranking.index(t) + 1)
    return round(total / max(len(list(qids)), 1), 4)


def tune_w_dense(
    tier_ranks: dict[str, dict[int, dict[int, int]]],
    targets: dict[int, int],
    tune_qids,
    grid=GRID,
) -> float:
    """Grid-pick w_dense by tune-half MRR; ties go to the weight
    closest to 1.0 (prefer the least-opinionated fusion), then the
    smaller weight — fully deterministic."""
    best = None
    for w in grid:
        m = mrr_of(
            rrf_fuse_py(tier_ranks, {"dense": w}), targets, tune_qids
        )
        key = (-m, abs(w - 1.0), w)
        if best is None or key < best[0]:
            best = (key, w)
    return best[1]


def build_task(spark, sf_dir: str):
    """The seeded hybrid_grade task: (docs, emb, terms DataFrame,
    target-of-query map, per-query base embeddings + seeded noise)."""
    import numpy as np
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sample = (
        docs.filter(
            F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
        )
        .join(
            emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
            "doc_id",
        )
        .orderBy("doc_id")
        .limit(Q)
        .collect()
    )
    targets = {i: int(r["doc_id"]) for i, r in enumerate(sample)}
    term_rows = []
    for i, r in enumerate(sample):
        toks = [t for t in r["text"].strip().split() if t]
        picks = sorted(
            {toks[len(toks) // 3], toks[len(toks) // 2],
             toks[2 * len(toks) // 3]}
        )
        term_rows += [(i, w, 1.0) for w in picks]
    terms = spark.createDataFrame(
        term_rows, "query_id bigint, w string, weight double"
    )
    rng = np.random.RandomState(0)
    base = {
        i: np.asarray(r["embedding"], dtype="float64")
        for i, r in enumerate(sample)
    }
    noise = {i: rng.standard_normal(base[i].shape[0]) for i in range(Q)}
    return docs, emb, terms, targets, base, noise


def qvecs_at(base, noise, alpha: float):
    import numpy as np

    out = []
    for i in sorted(base):
        v = base[i] / np.linalg.norm(base[i])
        n = noise[i] / np.linalg.norm(noise[i])
        mixed = alpha * v + (1.0 - alpha) * n
        out.append((i, (mixed / np.linalg.norm(mixed)).tolist()))
    return out


def ranks_from_pdf(pdf, id_field: str) -> dict[int, dict[int, int]]:
    out: dict[int, dict[int, int]] = {}
    for row in pdf.itertuples():
        out.setdefault(int(row.query_id), {})[
            int(getattr(row, id_field))
        ] = int(row.rank)
    return out


def dense_rank_pdf(spark, emb, qv, k: int = K):
    """Pure dense-tier rank list: exact cosine top-k per query via one
    broadcast-query corpus scan + a per-query rank window. Tier rank
    lists fed to the sweep must be PURE (a fused engine run can't
    yield them — RRF mixes the tiers before ranks exist), so dense is
    computed directly rather than through hybrid_rrf_batch."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gus_spark.operators.similarity import _as_double, _dot_cols

    qdf = spark.createDataFrame(
        [(int(i), v) for i, v in qv],
        "query_id bigint, qv array<double>",
    ).select(
        "query_id", "qv",
        F.sqrt(_dot_cols(F.col("qv"), F.col("qv"))).alias("qnorm"),
    )
    v = emb.select(
        F.col("vec_id").alias("doc_id"),
        _as_double(F.col("embedding")).alias("nv"),
    ).withColumn(
        "nnorm", F.sqrt(_dot_cols(F.col("nv"), F.col("nv")))
    )
    cos = _dot_cols(F.col("nv"), F.col("qv")) / (
        F.col("nnorm") * F.col("qnorm")
    )
    rk = F.row_number().over(
        Window.partitionBy("query_id").orderBy(
            F.col("cos_sim").desc(), F.col("doc_id")
        )
    )
    return (
        v.crossJoin(F.broadcast(qdf))
        .select("query_id", "doc_id", cos.alias("cos_sim"))
        .withColumn("rank", rk)
        .filter(F.col("rank") <= k)
        .select("query_id", "doc_id", "rank")
        .toPandas()
    )


def run_regimes(spark, sf_dir: str, alphas=ALPHAS) -> dict:
    """The full tune loop: build the seeded task once, then per alpha
    regime pick w_dense on the tune half, quote holdout MRR for
    unweighted vs tuned, and cross-check the chosen weight against
    the engine (hybrid_rrf_batch must rank every holdout target
    identically to the pure-Python fusion). Returns
    {alpha: {w_dense, mrr_holdout_unweighted, mrr_holdout_tuned,
    engine_agrees}} — the shape main() prints and
    tests/test_hybrid_tune.py asserts on."""
    from gus_spark.operators.hybrid import hybrid_rrf_batch
    from gus_spark.operators.retrieval import bm25_batch

    docs, emb, terms, targets, base, noise = build_task(spark, sf_dir)
    tune_q = [q for q in targets if q % 2 == 0]
    hold_q = [q for q in targets if q % 2 == 1]

    sparse = ranks_from_pdf(
        bm25_batch(docs, terms, K).toPandas(), "doc_id"
    )
    out = {}
    for alpha in alphas:
        qv = qvecs_at(base, noise, alpha)
        dense = ranks_from_pdf(
            dense_rank_pdf(spark, emb, qv), "doc_id"
        )
        tiers = {"sparse": sparse, "dense": dense}

        w = tune_w_dense(tiers, targets, tune_q)
        un = mrr_of(rrf_fuse_py(tiers, {}), targets, hold_q)
        tuned = mrr_of(rrf_fuse_py(tiers, {"dense": w}), targets, hold_q)

        # engine cross-check at the chosen weight: identical holdout
        # target ranks from hybrid_rrf_batch
        fused = hybrid_rrf_batch(
            docs, emb, terms, qv, K, k_each=K, w_dense=w
        ).toPandas()
        fused = fused.sort_values(
            ["query_id", "rrf_score", "doc_id"],
            ascending=[True, False, True],
        )
        fused["rank"] = fused.groupby("query_id").cumcount() + 1
        eng_ranks = {}
        for row in fused.itertuples():
            if int(row.doc_id) == targets[int(row.query_id)]:
                eng_ranks[int(row.query_id)] = int(row.rank)
        py = rrf_fuse_py(tiers, {"dense": w})
        py_ranks = {
            q: py[q].index(targets[q]) + 1
            for q in targets
            if targets[q] in py[q][:K]
        }
        engine_agrees = eng_ranks == py_ranks
        out[str(alpha)] = {
            "w_dense": w,
            "mrr_holdout_unweighted": un,
            "mrr_holdout_tuned": tuned,
            "engine_agrees": engine_agrees,
        }
    return out


def main() -> None:
    from gus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gus_spark-hybrid-tune")
    print(json.dumps(run_regimes(spark, sf_dir)))


if __name__ == "__main__":
    main()
