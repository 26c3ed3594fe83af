"""Streaming surface tests: batch/stream parity for windowed rollups,
session windows, and streaming dedup, driven synchronously via the file
source + memory sink."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR

from gus_spark.queries import table
from gus_spark.streaming import (
    dedup_stream,
    run_to_memory,
    session_aggregates,
    stream_events,
    windowed_rollup,
)


@pytest.fixture(scope="module")
def events_stream(spark):
    return stream_events(spark, SF_DIR)


def test_windowed_rollup_matches_batch(spark, events_stream):
    run_to_memory(windowed_rollup(events_stream), "rollup_out", mode="append")
    got = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM rollup_out").collect()
    }
    batch = (
        table(spark, SF_DIR, "events")
        .groupBy(
            F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type"
        )
        .agg(F.count("*").alias("n"))
    )
    expected = {(r.window_start, r.event_type): r.n for r in batch.collect()}
    # watermark may hold back the final windows in append mode; everything
    # emitted must match the batch counts exactly
    assert got, "stream emitted nothing"
    for key, (n, _) in got.items():
        assert expected.get(key) == n, key


def test_session_aggregates_run(spark, events_stream):
    run_to_memory(
        session_aggregates(events_stream), "sessions_out", mode="append"
    )
    rows = spark.sql("SELECT * FROM sessions_out").collect()
    assert rows, "no sessions emitted"
    assert all(r.session_start <= r.session_end for r in rows)
    assert all(r.n_events >= 1 for r in rows)


def test_dedup_stream_unique_ids(spark, events_stream):
    run_to_memory(dedup_stream(events_stream), "dedup_out", mode="append")
    df = spark.sql("SELECT event_id, COUNT(*) AS n FROM dedup_out GROUP BY 1")
    assert df.filter(F.col("n") > 1).count() == 0
    total = spark.sql("SELECT COUNT(*) AS n FROM dedup_out").first().n
    assert total > 0
