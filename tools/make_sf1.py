"""Synthesize an sf1 testdata directory by a key-consistent 10x
scale-up of sf0.1 — the driver ships sf <= 0.1 only, but the scaling
curve needs a point one decade further out to show the exponents hold
where data cost starts beating fixed cost.

The scale-up unions 10 copies of every row-scaled table with each
copy's keys offset by copy_index * (max_key + 1), applied CONSISTENTLY
across tables (copy i of orders references copy i of customer, copy i
of lineitem references copy i of orders/part/supplier), so every join's
fan-out and key distribution matches the original — the same shape
TPC-H scaling itself produces (more orders in the same date window).
Fixed dimensions (region, nation) stay fixed, exactly like TPC-H.

Documents get a per-copy word-level salt (word -> word_i) so copies
share NO shingles: near-dup structure replicates 10x linearly instead
of exploding quadratically through cross-copy exact duplicates, which
would distort the dedup exponent with output volume rather than
compute. Embedding vectors are reused as-is (timing-only corpus; ANN
cost depends on volume and bucket occupancy, not vector novelty).

Run: python tools/make_sf1.py [dest_dir]   (default /tmp/gus_sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SRC = "/root/testdata/sf0.1"
COPIES = 10

#: key columns to offset per table, grouped by the shared key space so
#: references stay aligned across tables (key_space -> [(table, col)])
KEY_SPACES = {
    "custkey": [("customer", "c_custkey"), ("orders", "o_custkey")],
    "orderkey": [("orders", "o_orderkey"), ("lineitem", "l_orderkey")],
    "partkey": [("part", "p_partkey"), ("lineitem", "l_partkey")],
    "suppkey": [("supplier", "s_suppkey"), ("lineitem", "l_suppkey")],
    "event_id": [("events", "event_id")],
    "user_id": [("events", "user_id")],
    "doc_id": [("documents", "doc_id")],
    "vec_id": [("embeddings", "vec_id")],
}

FIXED_DIMS = ["region", "nation"]
SCALED = [
    "customer", "orders", "lineitem", "part", "supplier",
    "events", "documents", "embeddings",
]


def _salt_text(col, i: int):
    """word -> word_<i>: copies share no 1-gram (hence no n-gram)
    shingles, so near-dup pairs replicate linearly across copies."""
    return F.array_join(
        F.transform(
            F.split(F.trim(col), r"\s+"),
            lambda w: F.concat(w, F.lit(f"_{i}")),
        ),
        " ",
    )


def make_sf1(spark: SparkSession, dest: str, src: str = SRC) -> None:
    os.makedirs(dest, exist_ok=True)
    # per-key-space strides from the source tables (max+1 keeps copies
    # disjoint and reference-consistent)
    stride: dict[str, int] = {}
    frames: dict[str, DataFrame] = {
        t: spark.read.parquet(f"{src}/{t}.parquet") for t in SCALED
    }
    for space, sites in KEY_SPACES.items():
        table0, col0 = sites[0]
        stride[space] = (
            frames[table0].agg(F.max(col0)).first()[0] + 1
        )

    for t in FIXED_DIMS:
        spark.read.parquet(f"{src}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{dest}/{t}.parquet")

    for t in SCALED:
        offsets = [
            (col, stride[space])
            for space, sites in KEY_SPACES.items()
            for table, col in sites
            if table == t
        ]
        copies = []
        for i in range(COPIES):
            df = frames[t]
            for col, step in offsets:
                df = df.withColumn(col, F.col(col) + F.lit(i * step))
            if t == "documents":
                df = df.withColumn("text", _salt_text(F.col("text"), i))
            copies.append(df)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        # 32 files, not 4: a real sf1 table arrives with >= slots row
        # groups, and scan parallelism IS the thing the sf1 timing
        # point exists to measure — 4 files would cap every map-only
        # query at 4 of 32 cores and report scheduler starvation as if
        # it were compute scaling.
        out.repartition(32).write.mode("overwrite").parquet(
            f"{dest}/{t}.parquet"
        )


def main() -> None:
    from gus_spark.session import get_spark

    dest = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gus_sf1"
    spark = get_spark(app_name="gus_spark-make-sf1")
    make_sf1(spark, dest)
    print(f"sf1 written to {dest}")


if __name__ == "__main__":
    main()
