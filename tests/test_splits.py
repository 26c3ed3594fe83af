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


class TestLoaderBoundary:
    """write_training_shards / read_training_shards /
    iter_training_order — the materialized (shard, pos) loader
    contract with a resume cursor."""

    WEIGHTS = {"train": 0.8, "validation": 0.1, "test": 0.1}
    SHARDS = 8

    @pytest.fixture(scope="class")
    def dest(self, spark, ids, tmp_path_factory):
        from gus_spark.operators.splits import write_training_shards

        dest = str(tmp_path_factory.mktemp("shards"))
        manifest = write_training_shards(
            ids, dest, shards=self.SHARDS, weights=self.WEIGHTS
        )
        return dest, manifest

    def test_manifest_is_a_write_receipt(self, ids, dest):
        dest, manifest = dest
        assert manifest["total_rows"] == ids.count()
        assert set(manifest["shard_rows"]) == set(self.WEIGHTS)
        for counts in manifest["shard_rows"].values():
            assert all(n > 0 for n in counts.values())

    def test_one_pos_ordered_file_per_shard(self, dest):
        import pyarrow.parquet as pq

        dest, manifest = dest
        data = os.path.join(dest, "data")
        for split, counts in manifest["shard_rows"].items():
            for shard, n in counts.items():
                d = os.path.join(
                    data, f"split={split}", f"shard={shard}"
                )
                files = [
                    f for f in os.listdir(d) if f.endswith(".parquet")
                ]
                assert len(files) == 1, (d, files)
                poss = pq.read_table(
                    os.path.join(d, files[0]), columns=["pos"]
                )["pos"].to_pylist()
                # rows are the dense permutation, ALREADY in order
                assert poss == list(range(1, n + 1)), d

    def test_full_order_matches_duckdb_twin(self, dest, con):
        from gus_spark.operators.splits import (
            iter_training_order,
            sql_hash_split,
            sql_shuffled_shards,
        )

        dest, _manifest = dest
        got = [
            i
            for batch, _cur in iter_training_order(
                dest, "train", batch_rows=512
            )
            for i in batch.column("doc_id").to_pylist()
        ]
        # the twin: same split labeling, same shard/pos ranking scoped
        # to the train split, ordered (shard, pos)
        labeled = sql_hash_split(self.WEIGHTS, table="ids")
        ranked = sql_shuffled_shards(
            self.SHARDS, table=f"(SELECT doc_id FROM ({labeled}) WHERE split = 'train')"
        )
        want = [
            r[0]
            for r in con.execute(
                f"SELECT doc_id FROM ({ranked}) ORDER BY shard, pos"
            ).fetchall()
        ]
        assert got == want

    def test_resume_cursor_is_exactly_once(self, dest):
        from gus_spark.operators.splits import iter_training_order

        dest, _manifest = dest
        full = []
        cursors = []
        for batch, cur in iter_training_order(
            dest, "train", batch_rows=97
        ):
            full.extend(batch.column("doc_id").to_pylist())
            cursors.append((cur, len(full)))
        # resume from every 5th checkpoint: suffix equality, no
        # duplicates, no gaps
        for cur, consumed in cursors[::5]:
            resumed = [
                i
                for b, _c in iter_training_order(
                    dest, "train", cursor=cur, batch_rows=97
                )
                for i in b.column("doc_id").to_pylist()
            ]
            assert resumed == full[consumed:], cur

    def test_spark_resume_prunes_partitions(self, spark, dest):
        from gus_spark.operators.splits import read_training_shards

        dest, manifest = dest
        df = read_training_shards(spark, dest, "train", cursor=(5, 3))
        plan = df._jdf.queryExecution().executedPlan().toString()
        # split/shard are partition directories: the resume filter
        # must reach PartitionFilters, not a post-scan Filter alone
        assert "PartitionFilters: [" in plan
        assert "shard" in plan.split("PartitionFilters:")[1].split("]")[0]
        got = {(r.shard, r.pos) for r in df.select("shard", "pos").collect()}
        n5 = manifest["shard_rows"]["train"]["5"]
        assert (5, 3) not in got and (5, 4) in got
        assert all(s > 5 or (s == 5 and p > 3) for s, p in got)
        assert sum(1 for s, _p in got if s == 5) == n5 - 3

    def test_verify_modes_emit_identical_manifests(
        self, ids, dest, tmp_path_factory
    ):
        """verify=False (footer counts, no data re-read) must emit the
        exact manifest verify=True (full decode recount) does on a
        clean write — the documented contract of the knob."""
        from gus_spark.operators.splits import write_training_shards

        dest, manifest = dest  # the class fixture wrote verify=True
        d2 = str(tmp_path_factory.mktemp("shards_noverify"))
        m2 = write_training_shards(
            ids, d2, shards=self.SHARDS, weights=self.WEIGHTS,
            verify=False,
        )
        assert m2 == manifest

    def test_fragmented_shard_dir_is_loud(
        self, spark, ids, tmp_path_factory
    ):
        """A session config that splits one (split, shard) directory
        into multiple files (here spark.sql.files.maxRecordsPerFile)
        voids iter_training_order's cross-file order — the writer must
        detect it from the directory tree and raise, in BOTH verify
        modes (the recount alone cannot see fragmentation)."""
        from gus_spark.operators.splits import write_training_shards

        spark.conf.set("spark.sql.files.maxRecordsPerFile", "10")
        try:
            for verify in (True, False):
                d = str(tmp_path_factory.mktemp(f"frag_{verify}"))
                with pytest.raises(ValueError, match="exactly ONE"):
                    write_training_shards(
                        ids, d, shards=2, weights=self.WEIGHTS,
                        verify=verify,
                    )
        finally:
            spark.conf.unset("spark.sql.files.maxRecordsPerFile")

    def test_escaped_split_names_verify_clean(
        self, spark, ids, tmp_path_factory
    ):
        """Split names Spark escapes in partition paths (':' ->
        '%3A') must verify clean and land UNESCAPED in the manifest —
        the footer walk decodes directory names before keying
        (r11 review: verify=True spuriously failed on 'train:v2')."""
        from gus_spark.operators.splits import write_training_shards

        from gus_spark.operators.splits import iter_training_order

        weights = {"train:v2": 0.5, "held out": 0.5}
        for verify in (True, False):
            d = str(tmp_path_factory.mktemp(f"esc_{verify}"))
            m = write_training_shards(
                ids, d, shards=2, weights=weights, verify=verify
            )
            assert set(m["shard_rows"]) == set(weights), m["shard_rows"]
        # the reader resolves the VALUE against escaped dirs too
        n = sum(
            b.num_rows for b, _c in iter_training_order(d, "train:v2")
        )
        assert n == sum(m["shard_rows"]["train:v2"].values())

    def test_epoch_reseed_reorders(self, spark, ids, tmp_path_factory):
        from gus_spark.operators.splits import (
            iter_training_order,
            write_training_shards,
        )

        d2 = str(tmp_path_factory.mktemp("shards_e2"))
        write_training_shards(
            ids, d2, shards=self.SHARDS, weights=self.WEIGHTS,
            seed="shuffle-v1-epoch2",
        )
        order2 = [
            i
            for b, _c in iter_training_order(d2, "train")
            for i in b.column("doc_id").to_pylist()
        ]
        # same membership (split seed unchanged), different permutation
        d1 = str(tmp_path_factory.mktemp("shards_e1"))
        write_training_shards(
            ids, d1, shards=self.SHARDS, weights=self.WEIGHTS
        )
        order1 = [
            i
            for b, _c in iter_training_order(d1, "train")
            for i in b.column("doc_id").to_pylist()
        ]
        assert sorted(order1) == sorted(order2)
        assert order1 != order2


def test_validation_errors(ids):
    from gus_spark.operators.splits import write_training_shards

    with pytest.raises(ValueError, match="shards"):
        shuffled_shards(ids, shards=0)
    with pytest.raises(ValueError, match="shards"):
        write_training_shards(ids, "/tmp/never-written", shards=0)
    # the writer derives split/shard/pos itself: a frame already
    # carrying one (e.g. curate_stream's own split labels) must fail
    # loudly, never be silently re-labeled
    with pytest.raises(ValueError, match="split"):
        write_training_shards(
            ids.withColumn("split", F.lit("train")), "/tmp/never-written"
        )
    with pytest.raises(ValueError, match="weights"):
        split_thresholds({})
    with pytest.raises(ValueError, match="sum"):
        split_thresholds({"a": 0.0})
    # thresholds partition the space exactly
    bounds = split_thresholds(DEFAULT_WEIGHTS)
    assert bounds[-1][1] == 16**15
    assert [b for _n, b in bounds] == sorted(b for _n, b in bounds)
