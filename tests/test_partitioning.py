"""Bucketed co-located join (no exchange) and salted skew aggregation."""

import contextlib
import io
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR

from gus_spark.operators.partitioning import (
    bucketed_join,
    salted_sum,
    write_bucketed,
)
from gus_spark.queries import table


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    orders = table(spark, SF_DIR, "orders")
    lineitem = table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "lineitem_b", "o_orderkey", n_buckets=8)
    joined = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain(mode="formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan
    # and the join is still correct
    expected = (
        table(spark, SF_DIR, "lineitem")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    assert joined.count() == expected


def test_salted_sum_equals_plain(spark):
    li = table(spark, SF_DIR, "lineitem")
    salted = {
        r.l_returnflag: (round(r.total, 4), r.n_rows)
        for r in salted_sum(li, "l_returnflag", "l_quantity").collect()
    }
    plain = {
        r.l_returnflag: (round(r.total, 4), r.n)
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"), F.count("*").alias("n"))
        .collect()
    }
    assert set(salted) == set(plain)
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert abs(salted[k][0] - plain[k][0]) < 1e-4
