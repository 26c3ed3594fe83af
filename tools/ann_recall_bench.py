"""Recall@k-vs-brute-force bench for the ANN operators at sf0.1.

Samples Q query vectors, computes their EXACT cosine top-k by scanning
the full corpus (Q×n dot products — cheap for a sample, unlike the
O(n²) all-pairs), then measures what fraction of those exact neighbors
the approximate indexes (multi-probe LSH, IVF) return.

Run: python tools/ann_recall_bench.py [sf_dir]
Prints one JSON line: {"sf": .., "n": .., "recall_lsh": .., "recall_ivf": ..,
"secs_lsh": .., "secs_ivf": ..}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

K = 5
N_QUERIES = 100


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from gus_spark.operators.similarity import _as_double, ann_lsh_topk, ivf_topk
    from gus_spark.queries import table
    from gus_spark.session import get_spark

    spark = get_spark(app_name="ann-recall-bench")
    e = table(spark, sf_dir, "embeddings")
    n = e.count()
    v = e.select("vec_id", _as_double(F.col("embedding")).alias("v"))
    # deterministic query sample: lowest N_QUERIES xxhash64 ids
    qids = [
        r.vec_id
        for r in v.select("vec_id")
        .orderBy(F.xxhash64("vec_id"), "vec_id")
        .limit(N_QUERIES)
        .collect()
    ]
    q = v.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, r: p * r), F.lit(0.0), lambda acc, x_: acc + x_
        )

    cos = dot(F.col("qv"), F.col("v")) / (
        F.sqrt(dot(F.col("qv"), F.col("qv"))) * F.sqrt(dot(F.col("v"), F.col("v")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "vec_id")
    exact = (
        v.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", cos.alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
    )
    exact_rows = exact.collect()
    truth = {(r.query_id, r.vec_id) for r in exact_rows}
    # graded tiers: hyperplane LSH's contract is high-similarity
    # retrieval — sign-bit agreement probability is 1 - angle/pi per
    # plane, so a cos~0.35 "nearest" neighbor of a weakly-clustered
    # vector is fundamentally hard for any bucketing scheme, while
    # cos>=0.8 neighbors are exactly what dedup/similarity pipelines ask
    # for. Report both so the trade is visible.
    truth_hi = {
        (r.query_id, r.vec_id) for r in exact_rows if r.cos_sim >= 0.8
    }

    def pq_two_stage():
        from gus_spark.operators.quantization import (
            pq_encode,
            pq_fit,
            pq_topk_rerank,
        )

        cb = pq_fit(e, m=16, iters=3)
        enc = pq_encode(e, cb)
        queries = [
            (int(r.query_id), list(r.qv)) for r in q.collect()
        ]
        return pq_topk_rerank(e, enc, queries, cb, k=K, shortlist=5 * K)

    results = {"sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1], "n": n, "k": K}
    for name, fn in (
        ("lsh", lambda: ann_lsh_topk(e, k=K)),
        ("ivf_p2", lambda: ivf_topk(e, k=K, nprobe=2)),
        ("ivf_p4", lambda: ivf_topk(e, k=K, nprobe=4)),
        # Lloyd-refined quantizer at HALF the index volume of ivf_p4
        ("ivf_lloyd", lambda: ivf_topk(
            e, k=K, nprobe=4, index_probes=2, lloyd_iters=3)),
        # PQ two-stage: ADC shortlist over 16-byte codes, exact re-rank
        ("pq", pq_two_stage),
    ):
        t0 = time.time()
        approx = {
            (r.query_id, r.neighbor_id)
            for r in fn().filter(F.col("query_id").isin(qids)).collect()
        }
        results[f"secs_{name}"] = round(time.time() - t0, 2)
        results[f"recall_{name}"] = (
            round(len(truth & approx) / len(truth), 4) if truth else None
        )
        results[f"recall_hi_{name}"] = (
            round(len(truth_hi & approx) / len(truth_hi), 4)
            if truth_hi
            else None
        )

    # SemDeDup grade: the clustered pass vs the exact single-cell
    # greedy leader (ground truth). Drop recall = fraction of exactly-
    # identified duplicates the clustered approximation also drops;
    # the miss mechanism is near-dups split across cell boundaries —
    # the approximation SemDeDup itself accepts. Threshold sits in this
    # corpus's top-similarity band (see queries.similarity
    # COSINE_THRESHOLD). The exact tier builds an n×n cell-local
    # matrix, so it only runs at sample scale (n ≤ 10k).
    if n <= 10_000:
        from gus_spark.operators.similarity import semantic_dedup

        thr = 0.45
        exact_drops = {
            r.vec_id
            for r in semantic_dedup(
                e, threshold=thr, k_cells=1, lloyd_iters=0
            ).collect()
            if not r.keep
        }
        results["semdedup_exact_dropped"] = len(exact_drops)
        # occupancy-vs-recall sweep: at moderate similarity the cell
        # count is the dominant error source (see SCALING.md) — k16 is
        # the scale config, k4 the recall-leaning one
        for kc in (16, 4):
            t0 = time.time()
            clus_drops = {
                r.vec_id
                for r in semantic_dedup(
                    e, threshold=thr, k_cells=kc, lloyd_iters=2
                ).collect()
                if not r.keep
            }
            results[f"secs_semdedup_k{kc}"] = round(time.time() - t0, 2)
            results[f"semdedup_dropped_k{kc}"] = len(clus_drops)
            results[f"semdedup_drop_recall_k{kc}"] = (
                round(len(exact_drops & clus_drops) / len(exact_drops), 4)
                if exact_drops
                else None
            )

    # multi-probe pair recall: exact cosine pairs at the corpus's
    # similarity band as driver-side numpy ground truth — BLOCKWISE
    # (4k-row strips against the full matrix) so the sf1 copy-up
    # corpus (20k vectors, VERDICT r6 #4) grades too without a 20k²
    # float64 allocation; indexing each vector in its top-ip cells
    # recovers cell-boundary pairs (the IVF lesson applied to
    # SemDeDup's candidate stage). k_cells=None exercises the
    # auto-occupancy default at every decade.
    # Above 25k vectors the full blockwise ground truth stops being a
    # driver-side triviality (sf10 = 200k vectors → 4e10 cosines and
    # ~10M exact pairs), so the grade switches to SAMPLED-pair recall:
    # exact pairs computed within a deterministic hash-sample of the
    # corpus (every sampled pair IS a real corpus pair), while
    # semantic_pairs still runs over the FULL corpus — recall on the
    # sampled pair population is an unbiased estimate of overall pair
    # recall, and the candidate structures face full-scale cell
    # occupancy.
    sem_sample_n = 12_000
    if n <= 25_000:
        import numpy as np

        from gus_spark.operators.similarity import (
            _as_double,
            semantic_pairs,
        )

        vec_rows = sorted(
            (r["vec_id"], r["v"]) for r in v.collect()
        )
        ids = np.array([r[0] for r in vec_rows])
        m = np.stack([np.asarray(r[1], dtype="float64") for r in vec_rows])
        nn = np.linalg.norm(m, axis=1)
        nn[nn == 0.0] = 1.0
        u = m / nn[:, None]
        exact_pairs = set()
        step = 4096
        for lo in range(0, len(ids), step):
            strip = u[lo : lo + step] @ u.T  # step x n
            ra, rb = np.nonzero(strip >= 0.45)
            keep = (ra + lo) < rb  # upper triangle only, no self-pairs
            exact_pairs.update(
                (int(ids[a + lo]), int(ids[b]))
                for a, b in zip(ra[keep], rb[keep])
            )
        results["sem_pairs_exact"] = len(exact_pairs)
        for ip in (1, 2):
            t0 = time.time()
            got = {
                (r["vec_id_a"], r["vec_id_b"])
                for r in semantic_pairs(
                    e, threshold=0.45, k_cells=None, index_probes=ip
                ).collect()
            }
            results[f"secs_sem_pairs_ip{ip}"] = round(time.time() - t0, 2)
            results[f"sem_pair_recall_ip{ip}"] = (
                round(len(got & exact_pairs) / len(exact_pairs), 4)
                if exact_pairs
                else None
            )
    else:
        import numpy as np

        from gus_spark.operators.similarity import semantic_pairs

        sample = v.orderBy(F.xxhash64("vec_id"), "vec_id").limit(
            sem_sample_n
        )
        vec_rows = sorted(
            (r["vec_id"], r["v"]) for r in sample.collect()
        )
        ids = np.array([r[0] for r in vec_rows])
        m = np.stack(
            [np.asarray(r[1], dtype="float64") for r in vec_rows]
        )
        nn = np.linalg.norm(m, axis=1)
        nn[nn == 0.0] = 1.0
        u = m / nn[:, None]
        sample_pairs = set()
        step = 4096
        for lo in range(0, len(ids), step):
            strip = u[lo : lo + step] @ u.T
            ra, rb = np.nonzero(strip >= 0.45)
            keep = (ra + lo) < rb
            sample_pairs.update(
                (int(ids[a + lo]), int(ids[b]))
                for a, b in zip(ra[keep], rb[keep])
            )
        # canonicalize: semantic_pairs emits a<b by vec_id; the
        # sample's (a,b) follow sorted vec_rows so they already are
        results["sem_pairs_sampled_exact"] = len(sample_pairs)
        id_set = set(int(i) for i in ids)
        for ip in (1, 2):
            t0 = time.time()
            got = {
                (r["vec_id_a"], r["vec_id_b"])
                for r in semantic_pairs(
                    e, threshold=0.45, k_cells=None, index_probes=ip
                ).collect()
                if r["vec_id_a"] in id_set and r["vec_id_b"] in id_set
            }
            results[f"secs_sem_pairs_full_ip{ip}"] = round(
                time.time() - t0, 2
            )
            results[f"sem_pair_recall_sampled_ip{ip}"] = (
                round(len(got & sample_pairs) / len(sample_pairs), 4)
                if sample_pairs
                else None
            )

    # duplicate-regime grade (no n×n matrix — ground truth is
    # analytic): for EXACT duplicate vectors, expected drops =
    # n − distinct vectors, and identical vectors always land in the
    # same cell, so the clustered pass should be perfect. The sf1/sf10
    # copy-up corpora are exactly this regime (each vector gains 9
    # cos=1.0 copies per decade). k_cells=None is the auto-occupancy
    # default (auto_k_cells: ~2k vectors/cell keeps the per-cell
    # cosine matrix ≤ ~32 MB whatever the corpus size — the formula
    # this bench previously inlined, now the operator's own default).
    from gus_spark.operators.similarity import semantic_dedup as _sd

    n_distinct = e.select("embedding").distinct().count()
    if n_distinct < n:
        t0 = time.time()
        drops = sum(
            1
            for r in _sd(
                e,
                threshold=0.95,
                k_cells=None,
                lloyd_iters=2,
            ).collect()
            if not r.keep
        )
        results["secs_semdedup_dup_regime"] = round(time.time() - t0, 2)
        results["semdedup_dup_expected"] = n - n_distinct
        results["semdedup_dup_dropped"] = drops
    print(json.dumps(results))


if __name__ == "__main__":
    main()
