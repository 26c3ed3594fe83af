"""Deterministic floating-point aggregation.

Summing doubles is order-dependent; Spark's partial/final aggregation
order varies with partitioning, so ``SUM(double)`` is not reproducible
bit-for-bit across engines (or even across runs). The engine's contract
with its correctness oracle is exact value equality, so every floating
aggregate is computed as

    CAST(SUM(CAST(x AS DECIMAL(25, s))) AS DOUBLE)

Decimal addition is exact and associative -> the sum is independent of
partition order; the final single cast to double is deterministic. The
double->decimal rounding step is itself engine-agnostic because a tie
(exactly .5 at the rounding digit) would require the true binary double
to sit on a decimal boundary it cannot represent.

Input precision is DECIMAL(18, s): 18 digits keeps Spark's Decimal in
its compact unscaled-long representation (~20% faster aggregation than
precision > 18, which forces BigDecimal); per-value range at s=6 is
1e12, far above any row-level price. The SUM result type grows to
precision 28+ automatically in both engines, so accumulated sums do not
overflow at scale (sf100 lineitem sums ~1e14).

Measured cost of the contract (sf0.1 q1 shape, local[32]): three
decimal sums + count = 1.33 s vs 0.41 s for plain double sums — the
~3x is the whole gap between q1 and a correctness-indifferent
engine, and it is the accepted price. The cheaper exact alternative —
fixed-point LONG sums (floor(x·10^s + 0.5) summed as int64, the trick
similarity_label_centroids uses for float32-origin values) — is NOT
scale-safe here: at the sf100k design point lineitem sums reach
~6e20 > 2^63, so the long accumulator overflows exactly where the
decimal's precision-28 growth keeps absorbing digits.

The same helpers emit the matching SQL text so Spark and oracle stay in
lock-step by construction.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

PRECISION = 18


def dsum(col: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM over a floating column -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({PRECISION},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 6) -> Column:
    """Deterministic AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return dsum(c, scale) / F.count(c)


def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"


#: fixed-point resolution for quantized LOG-SPACE values (DSIR log
#: ratios, BM25 per-(doc,term) scores, Gumbel keys): 1e-6 units.
FP_LOG = 1_000_000.0


def fp_quantize(x: Column, resolution: float = FP_LOG) -> Column:
    """floor(x * resolution + 0.5) as int64 — round-half-up fixed
    point, applied immediately after a transcendental expression so
    every downstream sum/comparison is exact integer arithmetic
    (order-free and engine-free; see operators/dsir.py's module doc
    for the quantization-boundary escape analysis). The DuckDB twin is
    CAST(FLOOR(x * <resolution> + 0.5) AS BIGINT), written inline in
    each oracle. Shared by operators/dsir.py and
    operators/retrieval.py so the determinism-critical primitive has
    ONE definition."""
    from pyspark.sql import functions as F

    return F.floor(x * F.lit(resolution) + F.lit(0.5)).cast("long")
