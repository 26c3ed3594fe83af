"""Measure the vector-index delete tier across two decades: what a
search PAYS for live tombstones (the broadcast anti-join before the
shortlist) and what a compaction fold costs, at sf0.1 (2k vectors) and
the synthesized sf1 10x copy-up (20k vectors, tools/make_sf1.py).

The scale claim under test: serving cost with live tombstones is the
clean-search cost plus a broadcast anti-join on the id column only —
bounded by the compaction contract (maintain(max_tomb_frac) folds
before tombstones grow past a fixed fraction), never by corpus size —
and the fold itself is one linear rewrite of the live rows. Wall
numbers at local scale are fixed-cost dominated; the DELTAS (tombed
minus clean, per decade) are the signal.

Run: python tools/vector_delete_bench.py
Prints one JSON line: {sf: {build, search_clean, delete, search_tombed,
compact, search_folded, n_rows, n_dead}} (seconds).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DELETE_FRAC = 7  # delete ids where vec_id % 7 == 3 (~14%)


def bench_sf(spark, sf_dir: str, label: str, out: dict) -> None:
    from gus_spark.operators.similarity import _as_double
    from gus_spark.operators.vector_index import VectorIndex

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    queries = [
        (int(r.vec_id), list(r.v))
        for r in emb.select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        ).limit(16).collect()
    ]
    root = tempfile.mkdtemp(prefix=f"vdb_{label}_")
    try:
        t0 = time.time()
        idx = VectorIndex(spark, root, iters=2)
        idx.fit(emb)
        idx.add(emb, batch_key="b0")
        build = time.time() - t0

        def _search() -> float:
            best = float("inf")
            for _ in range(3):
                t = time.time()
                idx.search(queries, k=5, nprobe=4).write.mode(
                    "overwrite"
                ).format("noop").save()
                best = min(best, time.time() - t)
            return best

        search_clean = _search()
        dead = emb.filter(
            F.col("vec_id") % DELETE_FRAC == 3
        ).select("vec_id")
        t0 = time.time()
        n_dead = idx.delete(dead, batch_key="d0")
        delete_s = time.time() - t0
        search_tombed = _search()
        t0 = time.time()
        idx.compact()
        compact_s = time.time() - t0
        search_folded = _search()
        out[label] = {
            "build": round(build, 3),
            "search_clean": round(search_clean, 3),
            "delete": round(delete_s, 3),
            "search_tombed": round(search_tombed, 3),
            "compact": round(compact_s, 3),
            "search_folded": round(search_folded, 3),
            "n_rows": emb.count(),
            "n_dead": n_dead,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from gus_spark.session import get_spark

    spark = get_spark(app_name="gus_spark-vector-delete-bench")
    out: dict[str, dict] = {}
    bench_sf(spark, "/root/testdata/sf0.1", "0.1", out)
    sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/gus_sf1")
    if not os.path.isdir(sf1_dir):
        from tools.make_sf1 import make_sf1

        make_sf1(spark, sf1_dir)
    bench_sf(spark, sf1_dir, "1", out)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
