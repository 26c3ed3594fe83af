"""Skew hardening: adversarial fixture where ONE user owns 50% of the
events. The three mitigations under test:

- salted aggregation spreads the hot key over n_salts reducers with an
  exact combined result (the straggler becomes n_salts parallel tasks);
- plain groupBy rollups survive the hot key anyway because map-side
  partial aggregation collapses it to one row per task BEFORE the
  shuffle (plan-asserted);
- the session enables AQE skew-join splitting for the join case.

Sessionization (a window by user_id) cannot split the hot user's
partition — its per-partition sort is the irreducible cost; the test
documents the bound: state is O(hot user rows), not O(table).
"""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from gus_spark.operators.partitioning import salted_sum

HOT_USER = 0
N_ROWS = 40_000
N_SALTS = 16


@pytest.fixture(scope="module")
def skewed(spark):
    """events-shaped frame: user 0 has 50% of all rows."""
    hot = spark.range(N_ROWS // 2).select(
        F.lit(HOT_USER).cast("long").alias("user_id"),
        (F.col("id") % 97).cast("double").alias("value"),
    )
    rest = spark.range(N_ROWS // 2).select(
        ((F.col("id") % 999) + 1).cast("long").alias("user_id"),
        (F.col("id") % 89).cast("double").alias("value"),
    )
    return hot.unionByName(rest)


def test_salted_sum_exact_and_balanced(spark, skewed):
    got = {
        r.user_id: (r.total, r.n_rows)
        for r in salted_sum(skewed, "user_id", "value", n_salts=N_SALTS).collect()
    }
    exact = {
        r.user_id: (r.total, r.n_rows)
        for r in skewed.groupBy("user_id")
        .agg(F.sum("value").alias("total"), F.count("*").alias("n_rows"))
        .collect()
    }
    assert got == exact  # salting never changes the answer
    # phase-1 balance: the hot key's rows spread across all salts and no
    # (key, salt) group exceeds 2x the fair share — the straggler task
    # is gone
    sizes = [
        r.n
        for r in skewed.filter(F.col("user_id") == HOT_USER)
        .withColumn("_salt", (F.rand(seed=42) * N_SALTS).cast("int"))
        .groupBy("_salt")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    fair = (N_ROWS // 2) / N_SALTS
    assert len(sizes) == N_SALTS
    assert max(sizes) <= 2 * fair, sizes


def test_partial_agg_collapses_hot_key_before_shuffle(spark, skewed):
    """The rollup family's defense: a partial HashAggregate runs before
    the Exchange, so each map task emits ONE row for the hot key — the
    shuffle carries O(tasks x keys), not O(rows)."""
    plan_df = skewed.groupBy("user_id").agg(
        F.count("*").alias("n"), F.sum("value").alias("v")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        plan_df.explain(mode="formatted")
    plan = buf.getvalue()
    assert plan.count("HashAggregate") >= 2  # partial + final
    # the Exchange sits between the two aggregates, not below the scan
    first_agg = plan.index("HashAggregate")
    assert "Exchange" in plan[first_agg:]


def test_session_has_skew_mitigations_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
        == "true"
    )


def test_sessionization_state_bounded_by_hot_user(spark, skewed):
    """The window-by-user shape on the adversarial fixture: the hot
    partition holds exactly the hot user's rows (50% of the table),
    never the whole table — and the result stays exact."""
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    running = skewed.select(
        "user_id", F.sum("value").over(w).alias("run")
    )
    # per-user row counts survive the window (no row explosion)
    counts = {
        r.user_id: r.n
        for r in running.groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert counts[HOT_USER] == N_ROWS // 2
    assert max(v for k, v in counts.items() if k != HOT_USER) <= N_ROWS // 2
