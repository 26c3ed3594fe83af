"""MinHashIndex tombstone deletes (late round 8): the PostingIndex /
VectorIndex delete contract applied to the near-dup fingerprint tier —
content-derived band rows and shingle sets must be removable with the
content (data-removal compliance), after which the forgotten documents
stop appearing as pair endpoints exactly as if never indexed, and can
re-index fresh after a fold.

Reference surface: none — extends the SURVEY §2.3 training-data layer.
"""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR_ORACLE

from gus_spark.operators.dedup import MinHashIndex
from gus_spark.queries import table


@pytest.fixture(scope="module")
def docs(spark):
    return (
        table(spark, SF_DIR_ORACLE, "documents")
        .filter(F.col("text").isNotNull())
        .filter(F.col("doc_id") < 100)
        .select("doc_id", "text")
    )


def _copies(docs, src_ids, offset=1000):
    """Verbatim copies of the given docs under fresh ids — guaranteed
    jaccard-1.0 near-dups of their sources."""
    return docs.filter(F.col("doc_id").isin(src_ids)).select(
        (F.col("doc_id") + offset).alias("doc_id"), "text"
    )


def _pairs(df):
    return {
        (int(r.doc_a), int(r.doc_b), round(float(r.jaccard), 12))
        for r in df.collect()
    }


def test_delete_matches_index_that_never_held_the_rows(
    spark, docs, tmp_path
):
    """delete() then probe == a twin index that only ever indexed the
    survivors: copies of deleted docs arrive as strangers (no pair),
    copies of survivors still pair — before AND after the maintain()
    fold drops the tombstoned fingerprints physically."""
    dead_ids = list(range(10))
    live_src = [20, 21, 22]
    probe = _copies(docs, dead_ids + live_src)

    idx = MinHashIndex(spark, str(tmp_path / "full"))
    idx.add_and_find(docs, batch_key="b0")
    n = idx.delete(dead_ids, batch_key="d0")
    assert n == 10

    twin = MinHashIndex(spark, str(tmp_path / "survivors"))
    twin.add_and_find(
        docs.filter(~F.col("doc_id").isin(dead_ids)), batch_key="b0"
    )

    got = _pairs(idx.add_and_find(probe, batch_key="p0"))
    want = _pairs(twin.add_and_find(probe, batch_key="p0"))
    assert got == want
    # the survivors' copies did pair; the deleted docs' copies did not
    assert {a for a, _b, _j in want} >= set(live_src)
    assert not {a for a, _b, _j in want} & set(dead_ids)

    # physical fold, then the same contract for a fresh probe
    out = idx.maintain(max_files=10_000, max_tomb_frac=0.0)
    assert out["compacted"]
    assert idx._read_meta()["tombs"] == {}
    assert not os.path.isdir(str(tmp_path / "full" / "tombs" / "tomb-d0"))
    probe2 = _copies(docs, dead_ids + live_src, offset=2000)
    got2 = _pairs(idx.add_and_find(probe2, batch_key="p1"))
    want2 = _pairs(twin.add_and_find(probe2, batch_key="p1"))
    assert got2 == want2


def test_replay_guards_and_readmittance(spark, docs, tmp_path):
    """Keyed deletes are idempotent; overlaps never double-count;
    absent ids are ignored; a live tombstone blocks re-indexing its id
    until the fold; a folded key raises; after the fold the forgotten
    doc re-indexes fresh (the compliance/re-admittance path)."""
    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.add_and_find(docs, batch_key="b0")

    assert idx.delete([1, 2, 3], batch_key="d0") == 3
    assert idx.delete([1, 2, 3], batch_key="d0") == 3  # replay no-op
    assert idx.delete([2, 3, 4, 99999], batch_key="d1") == 1
    assert idx._read_meta()["tombs"] == {"d0": 3, "d1": 1}

    with pytest.raises(ValueError, match="LIVE tombstones"):
        idx.add_and_find(
            docs.filter(F.col("doc_id") == 2), batch_key="re"
        )
    # crash-replay of a COMMITTED key skips the guard
    idx.add_and_find(docs, batch_key="b0")

    idx.maintain(max_files=10_000, max_tomb_frac=0.0)
    with pytest.raises(ValueError, match="folded"):
        idx.delete([7], batch_key="d0")
    # re-admittance: doc 2's content returns under its old id and
    # pairs against its own copy like any fresh document
    idx.add_and_find(
        docs.filter(F.col("doc_id") == 2), batch_key="re2"
    )
    pairs = _pairs(
        idx.add_and_find(_copies(docs, [2]), batch_key="p0")
    )
    assert (2, 1002, 1.0) in pairs


def test_streaming_tombstones_match_batch(spark, docs, tmp_path):
    """minhash_tombstone_stream: two delete micro-batches leave the
    index probing identically to batch deletes of the same ids; a
    fresh-checkpoint replay is a marker no-op; a replay AFTER the
    fold drains cleanly."""
    from gus_spark.streaming import minhash_tombstone_stream

    idx = MinHashIndex(spark, str(tmp_path / "idx"))
    idx.add_and_find(docs, batch_key="b0")
    dead = docs.filter(F.col("doc_id") % 9 == 1).select("doc_id")

    src = str(tmp_path / "dead_ids")
    dead.filter(F.col("doc_id") < 50).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    dead.filter(F.col("doc_id") >= 50).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(dead.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    minhash_tombstone_stream(
        stream, idx, str(tmp_path / "ckpt")
    ).awaitTermination()
    assert sum(idx._read_meta()["tombs"].values()) == dead.count()

    twin = MinHashIndex(spark, str(tmp_path / "twin"))
    twin.add_and_find(docs, batch_key="b0")
    twin.delete(dead)
    probe = _copies(docs, [1, 10, 20])
    want = _pairs(twin.add_and_find(probe, batch_key="p0"))
    assert _pairs(idx.add_and_find(probe, batch_key="p0")) == want

    # fresh checkpoint over the unchanged source: markers skip
    before = idx._read_meta()["tombs"]
    minhash_tombstone_stream(
        stream, idx, str(tmp_path / "ckpt2")
    ).awaitTermination()
    assert idx._read_meta()["tombs"] == before

    # fold, then a later replay still drains
    idx.maintain(max_files=10_000, max_tomb_frac=0.0)
    minhash_tombstone_stream(
        stream, idx, str(tmp_path / "ckpt3")
    ).awaitTermination()
    probe2 = _copies(docs, [1, 10, 20], offset=3000)
    got2 = _pairs(idx.add_and_find(probe2, batch_key="p1"))
    want2 = _pairs(twin.add_and_find(probe2, batch_key="p1"))
    assert got2 == want2
