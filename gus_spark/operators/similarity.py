"""Approximate nearest-neighbor search: random-hyperplane LSH (with
multi-probe) and IVF coarse quantization.

The scale path for similarity search over an embedding column. The
hyperplane matrix is a small deterministic ±1 matrix generated driver-
side (seeded, no RNG state) and embedded as literal arrays — each row's
bucket signature is then pure JVM column arithmetic; the only shuffle is
the bucket-key groupBy/self-join. Brute-force cosine (the correctness
baseline) lives in gus_spark.queries.similarity.

Scale design (the three knobs that keep the self-join bounded at 100 TB):

- the number of hyperplanes adapts to corpus size (``log2(n / target
  bucket rows)``), so mean bucket size stays ~constant as the corpus
  grows instead of buckets growing linearly;
- every query probes its own bucket PLUS the ``nprobe`` buckets reached
  by flipping its lowest-|margin| sign bits (the classic multi-probe
  trick): a vector near a hyperplane finds the neighbors that landed on
  the other side, which closes the singleton-bucket recall hole — a
  vector alone in its bucket still probes where its neighbors live;
- the candidate side is capped at ``bucket_cap`` rows per bucket
  (deterministic hash order), so one pathological hot bucket cannot
  produce an O(b²) task; with the cap the join cost is bounded by
  O(n × (nprobe+1) × bucket_cap) pairs.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gus_spark.operators.util import ensure_parallelism

NUM_PLANES = 12          # used when corpus size is not supplied/derivable
TARGET_BUCKET_ROWS = 16  # adaptive planes aim for this mean bucket size
MIN_PLANES, MAX_PLANES = 8, 24
DIM = 64


def planes_for_corpus(n_rows: int) -> int:
    """#hyperplanes so that 2^planes ≈ n / TARGET_BUCKET_ROWS, clamped.

    Doubling the corpus adds one plane — mean bucket occupancy stays
    ~TARGET_BUCKET_ROWS instead of doubling, which is what keeps the
    within-bucket self-join linear in n at any scale."""
    if n_rows <= 0:
        return NUM_PLANES
    raw = math.ceil(math.log2(max(n_rows / TARGET_BUCKET_ROWS, 2.0)))
    return max(MIN_PLANES, min(MAX_PLANES, raw))


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


def probe_buckets(
    vec: Column, planes: list[list[int]], nprobe: int
) -> Column:
    """Home bucket + the ``nprobe`` buckets reached by flipping the
    lowest-|margin| sign bits (multi-probe LSH). All JVM expressions:
    per-plane dot products feed both the signature and the margin sort;
    every bit shift is a Python-side literal, so nothing leaves
    whole-stage codegen."""
    dots = [_dot_lit(vec, plane) for plane in planes]
    sig = F.lit(0).cast("long")
    for i, d in enumerate(dots):
        bit = F.when(d > 0, 1).otherwise(0).cast("long")
        sig = sig + F.shiftleft(bit, i)
    # struct sort key = |margin| first -> flipping the most borderline
    # hyperplanes first, exactly the buckets a near-miss neighbor is in
    flips = F.array(
        *[
            F.struct(
                F.abs(d).alias("m"),
                sig.bitwiseXOR(F.lit(1 << i)).alias("fsig"),
            )
            for i, d in enumerate(dots)
        ]
    )
    flipped = F.transform(
        F.slice(F.array_sort(flips), 1, min(nprobe, len(planes))),
        lambda s: s["fsig"],
    )
    return F.concat(F.array(sig), flipped)


def ann_lsh_topk(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    num_planes: int | None = None,
    nprobe: int = 8,
    bucket_cap: int = 256,
) -> DataFrame:
    """Approximate top-k neighbors for every vector via multi-probe LSH.
    Output: (query_id, neighbor_id, cos_sim, rank).

    ``num_planes=None`` derives the plane count from the corpus size
    (one cheap count job — parquet footer metadata at scale) so mean
    bucket occupancy stays ~TARGET_BUCKET_ROWS. Each query probes its
    own bucket plus ``nprobe`` bit-flip neighbors, so singleton-bucket
    vectors still retrieve candidates; the candidate side is capped at
    ``bucket_cap`` rows per bucket (deterministic xxhash64 order) to
    bound skew. Within-probe pairs are ranked by exact cosine.
    """
    df = ensure_parallelism(df)
    if num_planes is None:
        num_planes = planes_for_corpus(df.count())
    planes = _plane_matrix(num_planes, DIM)
    v = df.select(
        F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
    )
    queries = v.select(
        F.col("id"),
        F.col("v"),
        F.explode(probe_buckets(F.col("v"), planes, nprobe)).alias("bucket"),
    )
    w_cap = Window.partitionBy("bucket").orderBy(F.xxhash64("id"), "id")
    candidates = (
        v.withColumn("bucket", bucket_signature(F.col("v"), planes))
        .withColumn("cap_rn", F.row_number().over(w_cap))
        .filter(F.col("cap_rn") <= bucket_cap)
        .drop("cap_rn")
    )
    a, b = queries.alias("a"), candidates.alias("b")

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
        # a pair can meet in several probed buckets; cosine is computed
        # identically each time, so distinct() collapses them exactly
        .distinct()
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
    dim: int = DIM,
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

    The centroid build is ``dim`` per-element SUM aggregates over one
    groupBy — map-side partial aggregation collapses each partition to
    one row per cell before the shuffle, with no posexplode row blowup
    (the explode formulation shuffles n×dim rows; this shuffles
    partitions×cells).
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

    # coarse quantizer: mean per dimension via dim scalar SUMs (partial
    # agg before the one shuffle; no n×dim explode)
    sums = v.groupBy("cell_seed").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum(F.element_at("v", i + 1)).alias(f"s{i}")
            for i in range(dim)
        ],
    )
    centroids = sums.select(
        F.col("cell_seed").alias("cell"),
        F.array(
            *[(F.col(f"s{i}") / F.col("n")) for i in range(dim)]
        ).alias("cv"),
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
