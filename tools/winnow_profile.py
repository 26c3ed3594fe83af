"""Winnow sf10-tail profile (VERDICT r7 #8): does Arrow batch size
move the rolling-kernel decade, and where is the floor?

Measures, per sf_dir:
- `fp_only_<mode>`: winnow_fingerprints -> noop (the hash stage alone)
  for mode in rolling / xxhash64 / md5;
- `pairs_rolling`: the full winnow_overlap_pairs (fingerprints +
  groupBy/join/agg) in rolling mode — fp_only vs pairs splits the
  per-char hash cost from the shared match-step cost that bounds any
  further hash-side win;
- `fp_rolling_b<N>`: the rolling hash stage under
  spark.sql.execution.arrow.maxRecordsPerBatch = N for N in
  2500 / 10000 (default) / 40000 — the batch-size sensitivity the
  round-7 verdict asked to measure. Each cell is min-of-2 after a
  warm run, one shared session (relative comparison, same conditions).

Run: python tools/winnow_profile.py [sf_dir ...]
(default /tmp/gus_sf1; pass /tmp/gus_sf10 for the last decade).
Prints one JSON line per sf_dir.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

BATCHES = (2500, 10000, 40000)


def _time(df, reps: int = 2) -> float:
    df.write.mode("overwrite").format("noop").save()  # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        df.write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    return round(best, 2)


def profile(sf_dir: str) -> dict:
    from gus_spark.operators.dedup import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )
    from gus_spark.queries import table
    from gus_spark.session import get_spark

    spark = get_spark(app_name="gus_spark-winnow-profile")
    docs = table(spark, sf_dir, "documents")
    out: dict = {"sf_dir": sf_dir, "docs": docs.count()}
    for mode in ("rolling", "xxhash64", "md5"):
        out[f"fp_only_{mode}"] = _time(
            winnow_fingerprints(docs, token_hash=mode)
        )
    out["pairs_rolling"] = _time(
        winnow_overlap_pairs(docs, token_hash="rolling")
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    default = spark.conf.get(key)
    try:
        for n in BATCHES:
            spark.conf.set(key, str(n))
            out[f"fp_rolling_b{n}"] = _time(
                winnow_fingerprints(docs, token_hash="rolling")
            )
    finally:
        spark.conf.set(key, default)
    return out


def main() -> None:
    dirs = sys.argv[1:] or ["/tmp/gus_sf1"]
    for d in dirs:
        print(json.dumps(profile(d)))


if __name__ == "__main__":
    main()
