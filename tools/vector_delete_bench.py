"""Measure the vector-index delete tier across up to THREE decades:
what a search PAYS for live tombstones (the broadcast anti-join before
the shortlist) and what a compaction fold costs, at sf0.1 (2k
vectors), the synthesized sf1 10x copy-up (20k vectors,
tools/make_sf1.py), and — when /tmp/gus_sf10 exists or
SPARK_GRAFT_SF10_DIR points at one (make_sf1 with src=sf1 composes
it) — sf10 (200k vectors), the decade where the anti-join tax vs the
fold cost stops being fixed-cost noise (VERDICT r9 ask #3).

The scale claim under test: serving cost with live tombstones is the
clean-search cost plus a broadcast anti-join on the id column only —
bounded by the compaction contract (maintain(max_tomb_frac) folds
before tombstones grow past a fixed fraction), never by corpus size —
and the fold itself is one linear rewrite of the live rows. Wall
numbers at local scale are fixed-cost dominated; the DELTAS (tombed
minus clean, per decade) are the signal.

TRIGGER PROBE (r10): the largest decade also runs the LONG-LIVED
index scenario — repeated ~5%% delete batches, maintain(max_tomb_frac
=0.2) after each. The probe records the tombstone fraction at every
step, which step actually folds, and the search cost right before vs
right after the fold: the maintain policy's claim is that the
anti-join tax is bounded by the trigger fraction, never by index age.

Run: python tools/vector_delete_bench.py
Prints one JSON line: {sf: {build, search_clean, delete, search_tombed,
compact, search_folded, n_rows, n_dead}, trigger: [...]} (seconds).
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


def trigger_probe(
    spark, sf_dir: str, max_tomb_frac: float = 0.2, steps: int = 6
) -> list[dict]:
    """Long-lived index scenario: ``steps`` successive ~5% delete
    batches, maintain(max_tomb_frac) after each. Per step: the live
    tombstone fraction BEFORE maintain, whether it folded, and the
    search seconds before/after (before == the tax the trigger bounds;
    after a fold it must read like a clean index again)."""
    from gus_spark.operators.similarity import _as_double
    from gus_spark.operators.vector_index import VectorIndex

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n_rows = emb.count()
    queries = [
        (int(r.vec_id), list(r.v))
        for r in emb.select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        ).limit(16).collect()
    ]
    root = tempfile.mkdtemp(prefix="vdb_trigger_")
    steps_out: list[dict] = []
    try:
        idx = VectorIndex(spark, root, iters=2)
        idx.fit(emb)
        idx.add(emb, batch_key="b0")

        def _search() -> float:
            best = float("inf")
            for _ in range(2):
                t = time.time()
                idx.search(queries, k=5, nprobe=4).write.mode(
                    "overwrite"
                ).format("noop").save()
                best = min(best, time.time() - t)
            return round(best, 3)

        for i in range(steps):
            dead = emb.filter(
                F.col("vec_id") % (steps * 4) == i
            ).select("vec_id")
            idx.delete(dead, batch_key=f"d{i}")
            s = idx.stats()
            frac = s["tomb_docs"] / max(n_rows, 1)
            search_before = _search()
            m = idx.maintain(
                max_files=10_000, max_tomb_frac=max_tomb_frac
            )
            steps_out.append(
                {
                    "step": i,
                    "tomb_frac": round(frac, 4),
                    "search_tombed": search_before,
                    "folded": bool(m["compacted"]),
                    "search_after": _search() if m["compacted"] else None,
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return steps_out


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
    # third decade, opt-in by presence (the scaling_bench convention):
    # compose with make_sf1(src=sf1_dir) first — 200k vectors
    sf10_dir = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/gus_sf10")
    biggest = sf1_dir
    if os.path.isdir(sf10_dir):
        bench_sf(spark, sf10_dir, "10", out)
        biggest = sf10_dir
    payload: dict = dict(out)
    payload["trigger"] = trigger_probe(spark, biggest)
    print(json.dumps(payload))


if __name__ == "__main__":
    main()
