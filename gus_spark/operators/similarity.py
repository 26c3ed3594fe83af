"""Approximate nearest-neighbor search: random-hyperplane LSH.

The scale path for similarity search over an embedding column. The
hyperplane matrix is a small deterministic ±1 matrix generated driver-
side (seeded, no RNG state) and embedded as literal arrays — each row's
bucket signature is then pure JVM column arithmetic; the only shuffle is
the bucket-key groupBy/self-join. Brute-force cosine (the correctness
baseline) lives in gus_spark.queries.similarity.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gus_spark.operators.util import ensure_parallelism

NUM_PLANES = 12
DIM = 64


def _plane_matrix(num_planes: int = NUM_PLANES, dim: int = DIM) -> list[list[int]]:
    """Deterministic ±1 hyperplane components via md5(seed|plane|dim)."""
    planes = []
    for p in range(num_planes):
        row = []
        for j in range(dim):
            digest = hashlib.md5(f"gus-lsh|{p}|{j}".encode()).digest()
            row.append(1 if digest[0] % 2 == 0 else -1)
        planes.append(row)
    return planes


def _as_double(col) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot_lit(vec: Column, plane: list[int]) -> Column:
    lit_plane = F.array(*[F.lit(float(s)) for s in plane])
    return F.aggregate(
        F.zip_with(vec, lit_plane, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def bucket_signature(vec: Column, planes: list[list[int]] | None = None) -> Column:
    """Pack hyperplane sign bits into one long — the LSH bucket key."""
    planes = planes or _plane_matrix()
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = F.when(_dot_lit(vec, plane) > 0, 1).otherwise(0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    return sig


def ann_lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Approximate top-k neighbors for every vector, restricted to its
    LSH bucket. Output: (query_id, neighbor_id, cos_sim, rank).

    Within-bucket pairs are exact cosine; vectors in singleton buckets
    yield no rows (callers fall back to brute force for them — or raise
    NUM_PLANES for finer buckets / lower recall).
    """
    planes = _plane_matrix(NUM_PLANES, DIM)
    df = ensure_parallelism(df)
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("bucket", bucket_signature(F.col("v"), planes))
    a, b = v.alias("a"), v.alias("b")

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0), lambda acc, x_: acc + x_
        )

    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
    )
    pairs = (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("query_id"),
            F.col("b.id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", F.col("rank").cast("long").alias("rank"))
    )


def ivf_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str | None = "label",
    k: int = 10,
    nprobe: int = 2,
) -> DataFrame:
    """IVF (inverted-file) approximate nearest neighbors.

    Coarse quantizer: per-``label_col`` centroids (deterministic — no
    iterative k-means state; a production build would Lloyd-iterate the
    same DataFrame shape). Every vector is assigned to its ``nprobe``
    nearest cells; candidates are vector pairs sharing a cell; exact
    cosine ranks them. Scale shape: centroids are a broadcast of
    O(cells × dim); the only row-scaled shuffle is the cell-key
    self-join — cost O(n²/cells) instead of O(n²), tunable by cell
    count, recall by ``nprobe``.
    """
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v"),
        F.col(label_col).alias("cell_seed"),
    )

    def dot(x, y):
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p * q), F.lit(0.0),
            lambda acc, x_: acc + x_,
        )

    # coarse quantizer: centroid per seed cell (mean per dimension)
    centroids = (
        v.select("cell_seed", F.posexplode("v").alias("dim", "x"))
        .groupBy("cell_seed", "dim")
        .agg(F.avg("x").alias("c"))
        .groupBy("cell_seed")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "c"))).alias("pairs"))
        .select(
            F.col("cell_seed").alias("cell"),
            F.transform("pairs", lambda p: p["c"]).alias("cv"),
        )
    )
    # assign each vector to its nprobe nearest centroids (cosine)
    scored = v.crossJoin(F.broadcast(centroids)).select(
        "id", "v", "cell",
        (
            dot(F.col("v"), F.col("cv"))
            / (F.sqrt(dot(F.col("v"), F.col("v")))
               * F.sqrt(dot(F.col("cv"), F.col("cv"))))
        ).alias("cell_sim"),
    )
    w_assign = Window.partitionBy("id").orderBy(F.desc("cell_sim"), "cell")
    assigned = (
        scored.withColumn("probe_rank", F.row_number().over(w_assign))
        .filter(F.col("probe_rank") <= nprobe)
        .select("id", "v", "cell")
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = dot(F.col("a.v"), F.col("b.v")) / (
        F.sqrt(dot(F.col("a.v"), F.col("a.v")))
        * F.sqrt(dot(F.col("b.v"), F.col("b.v")))
    )
    pairs = (
        a.join(b, (F.col("a.cell") == F.col("b.cell"))
               & (F.col("a.id") != F.col("b.id")))
        .select(
            F.col("a.id").alias("query_id"),
            F.col("b.id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .distinct()  # a pair can share several probed cells
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), "neighbor_id")
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim",
                F.col("rank").cast("long").alias("rank"))
    )
