"""Decompose a headline bench line into build / optimize / execute time.

Usage: python tools/bench_profile.py <query> [reps]

Runs in ONE fresh JVM (same warm-up discipline as bench.py --one) and
prints per-rep:
  build_s  — fn(spark, sf_dir): Python-side DataFrame construction
             (py4j traffic + any build-time driver actions)
  plan_s   — queryExecution().executedPlan() force: analysis +
             optimization + physical planning (codegen not included)
  exec_s   — noop write of the pre-built frame (execution incl. AQE
             re-planning and codegen)
Guide §1: know where the time goes before touching anything.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import bench
    from gus_spark.queries import catalog
    from gus_spark.session import get_spark

    spark = get_spark(app_name=f"gus_spark-profile-{name}")
    specs = catalog()
    fn = specs[name].fn if name in specs else bench.extra_queries()[name]
    # warm once end-to-end, exactly like bench.time_one
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    rows = []
    for _ in range(reps):
        t0 = time.time()
        df = fn(spark, sf_dir)
        t1 = time.time()
        df._jdf.queryExecution().executedPlan()
        t2 = time.time()
        df.write.mode("overwrite").format("noop").save()
        t3 = time.time()
        rows.append(
            {
                "build_s": round(t1 - t0, 3),
                "plan_s": round(t2 - t1, 3),
                "exec_s": round(t3 - t2, 3),
                "total_s": round(t3 - t0, 3),
            }
        )
    print(json.dumps({"query": name, "reps": rows}))


if __name__ == "__main__":
    main()
