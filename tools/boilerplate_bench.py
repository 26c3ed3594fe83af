"""Scaling decades for boilerplate removal (operators/boilerplate.py).

The synthetic corpus has no organic line structure, so the bench
seeds it deterministically — every document's tokens wrapped into
6-token lines plus a banner line injected on every doc and a plug on
every 2nd (the test suite's planted-boilerplate shape, scaled) —
then times the full cut (flag tier + canonical-keeper removal + text
rebuild) end-to-end to a noop sink, warm min-of-2 per decade — for
BOTH tiers (r10): 'exact' (one line-keyed exchange over every
distinct (line, doc) pair — the local default whose exchange is
vocabulary-sized) and 'certified' (heavy_hitters over per-doc
distinct lines — candidate exchange bounded by partitions x capacity,
the declared 100-TB path; at sf1+ the candidate static bound crosses
the broadcast-safe threshold, so this line also exercises the global
MG tree-merge regime in the wild). Per tier: wall seconds, lines
removed, and the certified tier's saturation flag.

The seeding runs INSIDE the timed plan on purpose: it is two JVM
column expressions over the scan (split/slice/concat — the same
class as the text operators SCALING already characterizes), and
materializing a seeded corpus per decade would measure parquet IO
instead of the operator.

Run: python tools/boilerplate_bench.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 /root/testdata/sf0.1 /tmp/gus_sf1
(+ /tmp/gus_sf10 when present). Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BANNER = "accept all cookies to continue"
PLUG = "subscribe to our weekly newsletter"


def seeded_docs(spark, sf_dir: str):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    ws = F.split(F.trim(F.col("text")), r"\s+")
    n_lines = F.ceil(F.size(ws) / F.lit(6)).cast("int")
    wrapped = F.array_join(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda i: F.array_join(F.slice(ws, i * 6 + 1, 6), " "),
        ),
        "\n",
    )
    text = F.concat(
        F.lit(BANNER + "\n"),
        wrapped,
        F.when(F.col("doc_id") % 2 == 0, F.lit("\n" + PLUG)).otherwise(
            F.lit("")
        ),
    )
    return docs.select("doc_id", text.alias("text"))


def main() -> None:
    from gus_spark.operators.boilerplate import remove_boilerplate
    from gus_spark.session import get_spark

    dirs = sys.argv[1:] or [
        d
        for d in (
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
            "/tmp/gus_sf1",
            "/tmp/gus_sf10",
        )
        if os.path.isdir(d)
    ]
    from gus_spark.operators.boilerplate import (
        certified_boilerplate_lines,
    )

    spark = get_spark(app_name="gus_spark-boilerplate-bench")
    out = {}
    for d in dirs:
        label = d.rstrip("/").rsplit("/", 1)[-1]
        out[label] = {}
        for tier in ("exact", "certified"):
            def make_cut():
                return remove_boilerplate(seeded_docs(spark, d), tier=tier)

            # fresh plan per iteration: the certified tier
            # localCheckpoints its sketch pass, so re-timing one frame
            # would skip it (the heavyhitters_bench lesson)
            make_cut().write.mode("overwrite").format("noop").save()
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                make_cut().write.mode("overwrite").format("noop").save()
                best = min(best, time.time() - t0)
            removed = make_cut().agg(F.sum("n_lines_removed")).first()[0]
            out[label][tier] = {
                "secs": round(best, 3),
                "lines_removed": int(removed or 0),
            }
        sat = certified_boilerplate_lines(seeded_docs(spark, d)).select(
            "saturated"
        ).first()
        out[label]["certified"]["saturated"] = (
            bool(sat["saturated"]) if sat else None
        )
    print(json.dumps({"metric": "boilerplate_remove", "decades": out}))


if __name__ == "__main__":
    main()
