"""Deterministic corpus splits and reproducible training order — the
last mile between a curated corpus and a training loader.

Two operators, both keyed on a content-independent (id, seed) hash so
assignments are REPRODUCIBLE (same seed → same split/order on any
cluster, any partitioning, any run) and STABLE under corpus growth (a
new document changes nothing about existing assignments — the property
random-number splits lose the moment rows move):

- `hash_split`: train/validation/test assignment as a pure map —
  ZERO shuffles at any corpus size. Each id hashes into a fixed
  integer space; split boundaries are exact integer thresholds
  computed once from the weights, so both engines compare the same
  literals (no float rounding drift).
- `shuffled_shards`: the reproducible global shuffle a training
  loader consumes — every row gets (shard, pos): shard by hash range,
  pos by rank of the hash within the shard. At 100 TB this is ONE
  shard-keyed exchange + a per-shard sort (the exchange a training-
  order materialization cannot avoid, and nothing more); shard count
  is the loader's file parallelism knob.

Hash: the first 15 hex chars of md5(seed || ':' || id) as a 60-bit
integer — the portable cross-engine identity this repo's oracle tiers
already use (dedup_simhash / winnowing precedent): DuckDB parses
'0x…' casts, Spark CONVs the same substring, and both engines see
identical buckets bit-for-bit. md5 here is a uniform-spreader, not a
security boundary.

Reference surface: none — extends the SURVEY §2.3 training-data
family (corpus → loader handoff).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the bucket space: 16^15 = 2^60 values from 15 md5 hex chars
_SPACE = 16**15

#: default three-way split — the conventional pretraining shape
DEFAULT_WEIGHTS: dict[str, float] = {
    "train": 0.98,
    "validation": 0.01,
    "test": 0.01,
}


def _bucket(id_col: Column, seed: str) -> Column:
    """Uniform 60-bit integer from (seed, id) — portable across
    engines (see module docstring)."""
    h = F.md5(F.concat(F.lit(seed), F.lit(":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long")


def _sql_bucket(id_expr: str, seed: str) -> str:
    quoted = seed.replace("'", "''")
    return (
        "CAST(('0x' || substr(md5('" + quoted + ":' || "
        f"CAST({id_expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
    )


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper bucket bound) per split, in the caller's
    insertion order — computed ONCE in exact integer arithmetic so the
    Spark expression and the SQL twin compare identical literals. The
    last split absorbs the rounding remainder (bounds end exactly at
    the space size, so every bucket lands somewhere)."""
    if not weights:
        raise ValueError("weights must name at least one split")
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("split weights must sum to > 0")
    bounds: list[tuple[str, int]] = []
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name] / total
        bounds.append((name, int(acc * _SPACE)))
    bounds.append((names[-1], _SPACE))
    return bounds


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row a split label — pure map, zero shuffles,
    reproducible and stable under growth (module docstring). Weights
    need not sum to 1 (normalized); boundaries are exact integers."""
    bounds = split_thresholds(
        DEFAULT_WEIGHTS if weights is None else weights
    )
    b = _bucket(F.col(id_col), seed)
    expr = F.lit(bounds[-1][0])
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(b < F.lit(upper), F.lit(name)).otherwise(expr)
    return df.withColumn(split_col, expr)


def sql_hash_split(
    weights: dict[str, float] | None = None,
    seed: str = "split-v1",
    table: str = "documents",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> str:
    """DuckDB twin of `hash_split` — identical thresholds, identical
    bucket identity."""
    bounds = split_thresholds(
        DEFAULT_WEIGHTS if weights is None else weights
    )
    b = _sql_bucket(id_col, seed)
    cases = " ".join(
        f"WHEN {b} < {upper} THEN '{name}'"
        for name, upper in bounds[:-1]
    )
    tail = bounds[-1][0]
    case = (
        f"CASE {cases} ELSE '{tail}' END" if cases else f"'{tail}'"
    )
    return f"SELECT *, {case} AS {split_col} FROM {table}"


def shuffled_shards(
    df: DataFrame,
    shards: int = 1024,
    seed: str = "shuffle-v1",
    id_col: str = "doc_id",
) -> DataFrame:
    """(…, shard, pos): the reproducible global training order. shard
    = hash-range bucket (uniform row counts by construction), pos =
    dense 1-based rank of the hash within the shard, ties broken by
    id (two ids can collide in 60 bits at planetary scale; the order
    must stay total). One shard-keyed exchange + per-shard sort —
    the minimal physical cost of materializing a global order — and
    the shard key is uniform, so no skew at any corpus size. Readers
    stream shards independently in (shard, pos) order; concatenated,
    that IS the seeded permutation."""
    if shards < 1:
        raise ValueError(f"shards must be >= 1, got {shards}")
    from pyspark.sql import Window

    b = _bucket(F.col(id_col), seed)
    shard = (b % F.lit(shards)).cast("int")
    w = Window.partitionBy("shard").orderBy("_order_bucket", id_col)
    return (
        df.withColumn("_order_bucket", b)
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .drop("_order_bucket")
    )


def sql_shuffled_shards(
    shards: int = 1024,
    seed: str = "shuffle-v1",
    table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of `shuffled_shards`."""
    b = _sql_bucket(id_col, seed)
    return f"""
    SELECT * EXCLUDE (_order_bucket),
           CAST(ROW_NUMBER() OVER (
             PARTITION BY shard ORDER BY _order_bucket, {id_col}
           ) AS BIGINT) AS pos
    FROM (
      SELECT *, {b} AS _order_bucket,
             CAST({b} % {shards} AS INTEGER) AS shard
      FROM {table})
    """
