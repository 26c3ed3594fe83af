"""Data-mixture planning and deterministic materialization.

A pre-training corpus is not one pile: it is a weighted MIXTURE of
domains (sources, languages) whose proportions are a tuned training
hyperparameter — GPT-3's per-dataset weights with >1 epoch for the
small high-quality sets (Brown et al. 2020, table 2.2), The Pile's
per-subset epochs (Gao et al. 2020, table 1), LLaMA's sampling
proportions (Touvron et al. 2023, table 1), and temperature-based
smoothing for multilingual balance (XLM-R, Conneau et al. 2020,
eq. 1: q_d ∝ p_d^alpha). This module is that step, Spark-first:

- `mixture_plan` computes, from the corpus itself, the per-domain
  sampling RATE that hits a token budget at the requested weights:
  one groupBy(domain) aggregation (map-side partials, a tiny
  shuffle of one row per domain). rate = budget * w_d / tokens_d;
  rate > 1 means the domain repeats (epochs), rate < 1 means it is
  downsampled. The plan IS a DataFrame — a few rows, broadcastable.
- `mixture_sample` materializes the mixture: broadcast-join the plan
  onto the corpus, emit floor(rate) full copies of every row plus one
  more copy iff a 16-bit md5 cut of the row's id clears the
  fractional remainder — the same deterministic hash-cut sampler as
  the stratified probe (no RNG: every engine and every run returns
  the identical row set, and a row's fate never depends on other
  rows). Repeats are a JVM `sequence` + `posexplode` — map-side,
  zero additional shuffles.
- `temperature_weights` derives the XLM-R-style smoothed weights
  from per-domain token counts on the driver (the counts are the
  plan's tiny aggregate — bounded-scalar class, never the corpus).

Scale shape: ONE aggregation shuffle with one output row per domain,
then a broadcast join and a pure map. At 100 TB the only thing that
grows is the scan; the plan stays a handful of rows. The whole path
is JVM expressions (md5/substring/sequence/posexplode) — no Python.

Determinism contract (the DuckDB oracle hash-matches values): token
counts are exact BIGINTs; rate is one double expression written
identically in both engines (IEEE-754 ops on identical inputs are
bit-identical); the fractional cut is floored to a 16-bit integer
and compared as a 4-hex-char string, so no float ever reaches the
per-row membership test.

Caveat (inherent to budget-driven mixing, not to the sampler): the
plan's rates depend on the corpus' domain totals, so appending data
changes rates and therefore membership. Freeze the PLAN (it is a
DataFrame — persist it) to get append-stable sampling; the per-row
hash-cut itself never looks at other rows.

Streaming: `mixture_sample` with a frozen plan is stateless (no agg,
no state — broadcast join + explode), so it composes directly into a
streaming micro-batch graph; the deterministic sampler makes the
drained stream row-identical to the batch materialization (asserted
in tests/test_mixing.py). `mixture_plan` is a corpus aggregate —
compute it batch-side, persist, and hand the frozen plan to the
stream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gus_spark.functions.tokenize import tokenize

#: resolution of the fractional hash cut: first 16 bits of md5(id).
_CUT_BITS = 65536


def _n_tokens(text: Column) -> Column:
    """Whitespace token count — the curation family's convention
    (split(trim(text), '\\s+'); see queries/curation.py for the
    phantom-empty-token caveat the convention documents)."""
    return F.size(tokenize(text)).cast("long")


def _weight_case(weights: dict[str, float], domain: Column) -> Column:
    expr = F.lit(None).cast("double")
    for d, w in weights.items():
        expr = F.when(domain == d, F.lit(float(w))).otherwise(expr)
    return expr


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """(domain, n_docs, n_tokens, weight, rate, epochs, cut) — one row
    per weighted domain present in the corpus. `epochs` full passes
    plus the `cut`-gated fractional pass over a domain yields
    ~`token_budget * weight` tokens of it in the mixture."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be > 0, got {token_budget}")
    for d, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for domain {d!r}: {w}")
    domain = F.col(domain_col)
    counts = (
        df.filter(F.col(text_col).isNotNull())
        .groupBy(domain.alias("domain"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(_n_tokens(F.col(text_col))).alias("n_tokens"),
        )
        .filter(F.col("n_tokens") > 0)
    )
    weight = _weight_case(weights, F.col("domain"))
    rate = (
        F.lit(float(token_budget))
        * F.col("weight")
        / F.col("n_tokens").cast("double")
    )
    frac_cut = F.floor(
        (F.col("rate") - F.floor(F.col("rate"))) * F.lit(_CUT_BITS)
    ).cast("int")
    return (
        counts.withColumn("weight", weight)
        .filter(F.col("weight").isNotNull())
        .withColumn("rate", rate)
        .withColumn("epochs", F.floor(F.col("rate")).cast("int"))
        .withColumn("cut", F.lpad(F.lower(F.hex(frac_cut)), 4, "0"))
    )


def mixture_sample(
    df: DataFrame,
    plan: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
) -> DataFrame:
    """The materialized mixture: every input row joined to its domain's
    plan row appears `epochs` times (epoch = 0..epochs-1) plus once
    more with epoch = epochs iff md5(id)'s first 16 bits clear `cut`.
    Unweighted domains drop (inner join). Output = input columns +
    `epoch` — downstream training reads repeats as distinct rows."""
    hash4 = F.substring(F.md5(F.col(id_col).cast("string")), 1, 4)
    joined = df.join(
        F.broadcast(
            plan.select(
                F.col("domain").alias(domain_col), "epochs", "cut"
            )
        ),
        domain_col,
    )
    # sequence(0, epochs) is inclusive: entries < epochs are the full
    # passes, the last entry is the fractional pass gated by the cut.
    kept = F.filter(
        F.sequence(F.lit(0), F.col("epochs")),
        lambda e: (e < F.col("epochs")) | (hash4 < F.col("cut")),
    )
    return (
        joined.select(*df.columns, F.explode(kept).alias("epoch"))
    )


def sql_mixture_plan(
    weights: dict[str, float],
    token_budget: int,
    table: str = "documents",
    domain_col: str = "source",
    text_col: str = "text",
) -> str:
    """DuckDB twin of `mixture_plan` as a CTE body (select one row per
    domain with epochs + cut), written so every float op matches the
    Spark expression: decimal literals cast to DOUBLE explicitly
    (DuckDB parses bare `0.3` as DECIMAL), counts as BIGINT, the same
    multiply-then-divide order."""
    w_case = " ".join(
        f"WHEN '{d}' THEN CAST({w!r} AS DOUBLE)" for d, w in weights.items()
    )
    return f"""
    SELECT domain, n_docs, n_tokens, weight,
           (CAST({token_budget} AS DOUBLE) * weight)
             / CAST(n_tokens AS DOUBLE) AS rate,
           CAST(FLOOR((CAST({token_budget} AS DOUBLE) * weight)
             / CAST(n_tokens AS DOUBLE)) AS INT) AS epochs,
           printf('%04x', CAST(FLOOR((
               (CAST({token_budget} AS DOUBLE) * weight)
                 / CAST(n_tokens AS DOUBLE)
               - FLOOR((CAST({token_budget} AS DOUBLE) * weight)
                 / CAST(n_tokens AS DOUBLE))
             ) * {_CUT_BITS}) AS INT)) AS cut
    FROM (
      SELECT {domain_col} AS domain,
             COUNT(*) AS n_docs,
             SUM(CAST(LENGTH(string_split_regex(TRIM({text_col}), '\\s+'))
                 AS BIGINT)) AS n_tokens,
             CASE {domain_col} {w_case} ELSE NULL END AS weight
      FROM {table}
      WHERE {text_col} IS NOT NULL
      GROUP BY 1, 4
    )
    WHERE n_tokens > 0 AND weight IS NOT NULL
    """


def temperature_weights(
    token_counts: dict[str, int], alpha: float = 0.3
) -> dict[str, float]:
    """XLM-R temperature sampling (Conneau et al. 2020, eq. 1):
    q_d ∝ p_d^alpha, normalized. alpha = 1 reproduces natural
    proportions, alpha → 0 approaches uniform. Driver-side pure
    Python over the plan's per-domain totals (bounded-scalar class —
    a handful of longs, never corpus data)."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    total = sum(token_counts.values())
    if total <= 0:
        raise ValueError("token_counts must sum to > 0")
    smoothed = {d: (c / total) ** alpha for d, c in token_counts.items()}
    z = sum(smoothed.values())
    return {d: s / z for d, s in smoothed.items()}
