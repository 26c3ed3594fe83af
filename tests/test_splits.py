"""Deterministic splits and reproducible training order
(operators/splits.py — round 10).

Contracts pinned here:
- bit-parity with the DuckDB twins for both operators on the sf0.01
  documents (the catalog probe's composition plus each alone);
- determinism and GROWTH STABILITY: re-running assigns identically,
  and adding documents never moves an existing assignment (the
  property rng-based splits lose when rows move);
- split proportions track the weights; seeds decorrelate;
- (shard, pos) is a valid permutation: positions are dense 1..n per
  shard, every id appears exactly once, shards are near-uniform;
- physical shape: hash_split adds NO exchange; shuffled_shards adds
  exactly the one shard-keyed exchange its contract states;
- degenerate inputs fail loudly.
"""

import contextlib
import io
import os
import re
import sys

import duckdb
import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR_ORACLE
from oracle_harness import frame_key

from gus_spark.operators.splits import (
    DEFAULT_WEIGHTS,
    hash_split,
    shuffled_shards,
    split_thresholds,
    sql_hash_split,
    sql_shuffled_shards,
)
from gus_spark.queries import table


@pytest.fixture(scope="module")
def ids(spark):
    return table(spark, SF_DIR_ORACLE, "documents").select("doc_id")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR_ORACLE}/documents.parquet'"
    )
    c.execute("CREATE VIEW ids AS SELECT doc_id FROM documents")
    return c


def test_split_matches_duckdb_twin(ids, con):
    got = hash_split(ids).toPandas()
    odf = con.execute(sql_hash_split(table="ids")).df()
    assert frame_key(got) == frame_key(odf)


def test_shards_match_duckdb_twin(ids, con):
    got = shuffled_shards(ids, shards=16).toPandas()
    odf = con.execute(
        sql_shuffled_shards(table="ids", shards=16)
    ).df()
    assert frame_key(got) == frame_key(odf)


def test_determinism_and_growth_stability(spark, ids):
    base = {
        r.doc_id: r.split for r in hash_split(ids).collect()
    }
    again = {
        r.doc_id: r.split for r in hash_split(ids).collect()
    }
    assert base == again
    # grow the corpus: every pre-existing assignment is untouched
    grown = ids.unionByName(
        spark.createDataFrame(
            [(10_000 + i,) for i in range(200)], "doc_id bigint"
        )
    )
    after = {
        r.doc_id: r.split for r in hash_split(grown).collect()
    }
    assert all(after[k] == v for k, v in base.items())


def test_split_proportions_and_seed_decorrelation(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(20_000)], "doc_id bigint"
    )
    counts = {
        r.split: r.n
        for r in hash_split(
            df, {"train": 0.8, "validation": 0.1, "test": 0.1}
        )
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(counts) == {"train", "validation", "test"}
    assert abs(counts["train"] / 20_000 - 0.8) < 0.02
    assert abs(counts["validation"] / 20_000 - 0.1) < 0.01
    # a different seed reassigns: the two labelings must disagree on
    # roughly (1 - sum w_i^2) of rows, certainly on SOME
    a = hash_split(df, seed="s-a").withColumnRenamed("split", "sa")
    b = hash_split(df, seed="s-b").select(
        "doc_id", F.col("split").alias("sb")
    )
    moved = a.join(b, "doc_id").filter(F.col("sa") != F.col("sb"))
    assert moved.count() > 100


def test_shards_form_a_permutation(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(5_000)], "doc_id bigint"
    )
    out = shuffled_shards(df, shards=8).collect()
    assert len({r.doc_id for r in out}) == 5_000
    by_shard: dict[int, list[int]] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    assert set(by_shard) == set(range(8))
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(1, len(poss) + 1)), shard
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) < 2 * min(sizes)  # uniform hash range
    # the order is a real shuffle, not id order
    s0 = sorted(
        ((r.pos, r.doc_id) for r in out if r.shard == 0)
    )
    assert [d for _p, d in s0] != sorted(d for _p, d in s0)


def test_plan_shape(ids):
    def plan_of(df) -> str:
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain(mode="formatted")
        return buf.getvalue()

    p = plan_of(hash_split(ids))
    assert "Exchange" not in p, p  # pure map
    p2 = plan_of(shuffled_shards(ids, shards=16))
    assert len(re.findall(r"\(\d+\) Exchange\b", p2)) == 1, p2


def test_validation_errors(ids):
    with pytest.raises(ValueError, match="shards"):
        shuffled_shards(ids, shards=0)
    with pytest.raises(ValueError, match="weights"):
        split_thresholds({})
    with pytest.raises(ValueError, match="sum"):
        split_thresholds({"a": 0.0})
    # thresholds partition the space exactly
    bounds = split_thresholds(DEFAULT_WEIGHTS)
    assert bounds[-1][1] == 16**15
    assert [b for _n, b in bounds] == sorted(b for _n, b in bounds)
