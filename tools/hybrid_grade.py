"""Grade hybrid RRF against its own tiers: does fusing BM25 with the
dense tier beat either alone when each signal degrades? (The
dsir_grade/lm_grade pattern applied to retrieval quality.)

Task construction (deterministic, seeded): each of Q query docs is
its own relevance target — query TERMS are three mid-document tokens
(a weak-but-real sparse signal: the synthetic corpus shares
vocabulary heavily, so BM25 often but not always ranks the source
first), and the query VECTOR is the target's embedding mixed with
seeded unit noise at level alpha (alpha=1 → the dense tier is
trivially perfect; alpha→0 → the dense signal dissolves). MRR@K per
tier and for the fusion across the alpha grid shows the RRF
robustness claim: hybrid tracks the better tier at the extremes and
beats both in the middle, where each tier is right on different
queries.

Run: python tools/hybrid_grade.py [sf_dir] (default testdata sf0.01)
One JSON line: {alpha: {mrr_sparse, mrr_dense, mrr_hybrid,
hits_sparse, hits_dense, hits_hybrid}} over Q queries, K=100.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from pyspark.sql import functions as F

Q = 50
K = 100
ALPHAS = (1.0, 0.7, 0.5, 0.3, 0.1)


def mrr(rank_by_query: dict[int, int]) -> tuple[float, int]:
    """Mean reciprocal rank over Q (missing → 0) and the hit count."""
    rr = [1.0 / rank_by_query[q] for q in rank_by_query]
    return (round(sum(rr) / Q, 4), len(rank_by_query))


def target_ranks(pdf, id_of_query: dict[int, int], rank_col: str) -> dict:
    """query_id -> rank of its own target doc (absent when the target
    missed the top-K)."""
    out = {}
    for row in pdf.itertuples():
        qid = int(row.query_id)
        if int(row.doc_id) == id_of_query[qid]:
            out[qid] = int(getattr(row, rank_col))
    return out


def main() -> None:
    from gus_spark.operators.hybrid import hybrid_rrf_batch
    from gus_spark.operators.retrieval import bm25_batch
    from gus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="gus_spark-hybrid-grade")
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
    id_of_query = {i: int(r["doc_id"]) for i, r in enumerate(sample)}

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
    sparse = bm25_batch(docs, terms, K).toPandas()
    sparse_ranks = target_ranks(sparse, id_of_query, "rank")

    rng = np.random.RandomState(0)
    base = {
        i: np.asarray(r["embedding"], dtype="float64") for i, r in
        enumerate(sample)
    }
    noise = {
        i: rng.standard_normal(base[i].shape[0]) for i in range(Q)
    }
    out = {}
    for alpha in ALPHAS:
        qvecs = []
        for i in range(Q):
            v = base[i] / np.linalg.norm(base[i])
            n = noise[i] / np.linalg.norm(noise[i])
            mixed = alpha * v + (1.0 - alpha) * n
            qvecs.append((i, (mixed / np.linalg.norm(mixed)).tolist()))
        fused = hybrid_rrf_batch(
            docs, emb, terms, qvecs, K, k_each=K
        ).toPandas()
        # the standard mitigation for one-tier dominance: weight the
        # stronger tier (here 3x dense — a deployment would tune this
        # on a held-out slice)
        fused_w = hybrid_rrf_batch(
            docs, emb, terms, qvecs, K, k_each=K, w_dense=3.0
        ).toPandas()
        # dense-only ranks ride the same fusion output: a doc returned
        # with a dense contribution has rank recoverable from the
        # single-tier runs — recompute dense directly for clarity
        from gus_spark.operators.hybrid import dense_topk

        dense_ranks: dict[int, int] = {}
        for i, qv in qvecs:
            dn = dense_topk(emb, qv, K).toPandas()
            hit = dn[dn["vec_id"] == id_of_query[i]]
            if len(hit):
                dense_ranks[i] = int(hit["rank"].iloc[0])
        def fused_ranks(pdf):
            pdf = pdf.sort_values(
                ["query_id", "rrf_score", "doc_id"],
                ascending=[True, False, True],
            )
            pdf["rank"] = pdf.groupby("query_id").cumcount() + 1
            return target_ranks(pdf, id_of_query, "rank")

        ms, hs = mrr(sparse_ranks)
        md, hd = mrr(dense_ranks)
        mh, hh = mrr(fused_ranks(fused))
        mw, hw = mrr(fused_ranks(fused_w))
        out[str(alpha)] = {
            "mrr_sparse": ms, "mrr_dense": md, "mrr_hybrid": mh,
            "mrr_hybrid_wd3": mw,
            "hits_sparse": hs, "hits_dense": hd, "hits_hybrid": hh,
            "hits_hybrid_wd3": hw,
        }
        if alpha == min(ALPHAS):
            # the forensic stack in the WEAKEST regime: when verbatim
            # evidence exists (each query carries 3 consecutive
            # mid-document tokens of its target as an exact phrase),
            # the phrase tier should carry the fusion on its own
            phrase_rows = []
            for i, r in enumerate(sample):
                toks = [t for t in r["text"].strip().split() if t]
                m = len(toks) // 2
                phrase_rows.append((i, toks[m : m + 3]))
            phrases = spark.createDataFrame(
                phrase_rows, "query_id bigint, phrase array<string>"
            )
            fused_f = hybrid_rrf_batch(
                docs, emb, terms, qvecs, K, k_each=K, phrases=phrases
            ).toPandas()
            mf, hf = mrr(fused_ranks(fused_f))
            out[str(alpha)]["mrr_forensic"] = mf
            out[str(alpha)]["hits_forensic"] = hf
    print(json.dumps(out))


if __name__ == "__main__":
    main()
