"""VectorIndex tombstone deletes (round 8): the PostingIndex delete
contract applied to the dense tier — curation removals must stop
serving as ANN neighbors, bit-identically to an index that never held
them, before AND after the compaction that folds the tombstones
physically.

Reference surface: none — the reference engine has no vector path;
this extends the SURVEY §2.3 training-data layer.
"""

import os
import shutil
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR_ORACLE

from gus_spark.operators.similarity import _as_double
from gus_spark.operators.vector_index import VectorIndex
from gus_spark.queries import table


@pytest.fixture(scope="module")
def embeddings(spark):
    return table(spark, SF_DIR_ORACLE, "embeddings")


@pytest.fixture(scope="module")
def queries(embeddings):
    return [
        (int(r.vec_id), list(r.v))
        for r in embeddings.select(
            "vec_id", _as_double(F.col("embedding")).alias("v")
        ).limit(8).collect()
    ]


def _clone_model(src: VectorIndex, spark, path: str) -> VectorIndex:
    """A second index sharing src's FROZEN quantizer — encoding is
    deterministic against the model, so parity comparisons isolate
    the row-set difference."""
    twin = VectorIndex(spark, path, iters=src.iters, m=src.m,
                       codes=src.codes)
    for name in ("centroids.npy", "codebooks.npy"):
        shutil.copy(os.path.join(src.path, name),
                    os.path.join(path, name))
    return twin


def _adc(idx: VectorIndex, queries, k=5):
    return {
        (r.query_id, r.neighbor_id, round(r.adc_sim, 9))
        for r in idx.search(queries, k=k, nprobe=4).collect()
    }


def _rerank(idx: VectorIndex, queries, rerank_df, k=5):
    return {
        (r.query_id, r.neighbor_id, round(r.cos_sim, 9))
        for r in idx.search(
            queries, k=k, nprobe=4, shortlist=25, rerank_df=rerank_df
        ).collect()
    }


def test_delete_matches_index_that_never_held_the_rows(
    spark, embeddings, queries, tmp_path
):
    """delete() then search == an index (same frozen model) that only
    ever added the survivors — on BOTH serving paths (ADC-ranked and
    exact-re-rank), and unchanged after compact() folds the
    tombstones physically. The anti-join runs BEFORE the shortlist,
    so a dead vector can't evict a live neighbor from the candidate
    set — exactly what the never-added twin guarantees."""
    idx = VectorIndex(spark, str(tmp_path / "full"), iters=2)
    idx.fit(embeddings)
    idx.add(embeddings.filter(F.col("vec_id") < 250), batch_key="lo")
    idx.add(embeddings.filter(F.col("vec_id") >= 250), batch_key="hi")

    dead = embeddings.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    n_dead = dead.count()
    assert idx.delete(dead, batch_key="d0") == n_dead
    st = idx.stats()
    assert st["n_rows"] == 500 - n_dead
    assert st["n_tombs"] == 1 and st["tomb_docs"] == n_dead

    survivors = embeddings.join(dead, "vec_id", "left_anti")
    twin = _clone_model(idx, spark, str(tmp_path / "survivors"))
    twin.add(survivors)

    # rerank_df may legitimately still contain the deleted vectors
    # (the raw table outlives the curation pass): the shortlist ids
    # are live-only, so they never join back in
    assert _adc(idx, queries) == _adc(twin, queries)
    assert _rerank(idx, queries, embeddings) == _rerank(
        twin, queries, embeddings
    )

    # physical fold: tombstone dirs gone, results identical
    idx.compact()
    st2 = idx.stats()
    assert st2["n_tombs"] == 0 and st2["tomb_docs"] == 0
    assert st2["n_rows"] == 500 - n_dead
    assert not os.path.isdir(os.path.join(str(tmp_path / "full"),
                                          "tombs", "tomb-d0"))
    assert _adc(idx, queries) == _adc(twin, queries)
    assert _rerank(idx, queries, embeddings) == _rerank(
        twin, queries, embeddings
    )


def test_delete_replay_overlap_and_add_guard(
    spark, embeddings, queries, tmp_path
):
    """The replay contract: a keyed delete is idempotent; overlapping
    batches never double-count; absent ids are ignored; a live
    tombstone blocks re-adding its id (the serving anti-join would
    hide the new codes) until a compaction folds it; a folded key
    raises on replay."""
    idx = VectorIndex(spark, str(tmp_path / "idx"), iters=2)
    idx.fit(embeddings)
    idx.add(embeddings, batch_key="b0")

    assert idx.delete([1, 2, 3], batch_key="d0") == 3
    assert idx.delete([1, 2, 3], batch_key="d0") == 3  # replay: no-op
    assert idx.stats()["tomb_docs"] == 3
    # overlap + absent ids: only 4 and 5 are new; 99999 isn't indexed
    assert idx.delete([2, 3, 4, 5, 99999], batch_key="d1") == 2
    assert idx.stats()["tomb_docs"] == 5
    assert idx.stats()["n_rows"] == 495

    with pytest.raises(ValueError, match="tombstone"):
        idx.add(embeddings.filter(F.col("vec_id") == 2), batch_key="re")
    # a crash-replay of a COMMITTED add key skips the guard even when
    # its ids have since been deleted
    assert idx.add(embeddings, batch_key="b0") == 500

    idx.compact()
    with pytest.raises(ValueError, match="folded"):
        idx.delete([7], batch_key="d0")
    # after the fold the id space reopens
    assert idx.add(
        embeddings.filter(F.col("vec_id") == 2), batch_key="re2"
    ) == 1
    assert idx.stats()["n_rows"] == 496


def test_maintain_tombstone_fraction_triggers_fold(
    spark, embeddings, tmp_path
):
    """maintain() compacts on tombstoned FRACTION, not just file
    count — a long-lived index under heavy curation pays the ghost
    scan + anti-join per search until the fold."""
    idx = VectorIndex(spark, str(tmp_path / "idx"), iters=2)
    idx.fit(embeddings)
    idx.add(embeddings, batch_key="b0")
    idx.delete(list(range(100)), batch_key="d0")

    out = idx.maintain(max_files=1000, max_tomb_frac=0.5)
    assert not out["compacted"]          # 100/400 = 0.25 <= 0.5
    assert idx.stats()["n_tombs"] == 1
    out = idx.maintain(max_files=1000, max_tomb_frac=0.2)
    assert out["compacted"]              # 0.25 > 0.2
    st = idx.stats()
    assert st["n_tombs"] == 0 and st["n_rows"] == 400


def test_streaming_tombstones_match_batch_and_replay(
    spark, embeddings, queries, tmp_path
):
    """vector_tombstone_stream: two delete micro-batches leave the
    index serving bit-identically to batch deletes of the same ids; a
    fresh-checkpoint replay is a no-op (disjoint marker namespace vs
    the add stream's markers under the index path); a replay AFTER
    compaction drains cleanly (markers fire before the folded-key
    guard)."""
    from gus_spark.streaming import (
        vector_index_stream,
        vector_tombstone_stream,
    )

    idx = VectorIndex(spark, str(tmp_path / "idx"), iters=2)
    idx.fit(embeddings)
    # ingest through the ADD stream first, so both streams' batch-0
    # markers coexist under one index path
    src_add = str(tmp_path / "add")
    embeddings.coalesce(1).write.mode("append").parquet(src_add)
    add_stream = (
        spark.readStream.schema(embeddings.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_add)
    )
    vector_index_stream(
        add_stream, idx, str(tmp_path / "ckpt_add")
    ).awaitTermination()

    dead = embeddings.filter(F.col("vec_id") % 11 == 5).select("vec_id")
    src = str(tmp_path / "dead_ids")
    dead.filter(F.col("vec_id") < 250).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    dead.filter(F.col("vec_id") >= 250).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = (
        spark.readStream.schema(dead.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    vector_tombstone_stream(
        stream, idx, str(tmp_path / "ckpt")
    ).awaitTermination()
    assert idx.stats()["n_tombs"] == 2

    twin = _clone_model(idx, spark, str(tmp_path / "twin"))
    twin.add(embeddings)
    twin.delete(dead)
    want = _adc(twin, queries)
    assert _adc(idx, queries) == want

    # fresh checkpoint over the unchanged id source: markers skip
    st = idx.stats()
    vector_tombstone_stream(
        stream, idx, str(tmp_path / "ckpt2")
    ).awaitTermination()
    assert idx.stats() == st

    # compaction folds the tombstones; a later replay still drains
    assert idx.compact() is not None
    assert idx.stats()["n_tombs"] == 0
    vector_tombstone_stream(
        stream, idx, str(tmp_path / "ckpt3")
    ).awaitTermination()
    assert _adc(idx, queries) == want


def test_decontaminate_index_drives_vector_tombstones(
    spark, embeddings, tmp_path
):
    """decontaminate_index is duck-typed over delete(ids_df,
    batch_key=...): pointed at a VectorIndex whose id_col names the
    document ids, a newly-landed benchmark retroactively removes the
    contaminated docs' EMBEDDINGS from ANN serving — the dense half
    of the retroactive story."""
    from gus_spark.operators.decontaminate import decontaminate_index

    docs = table(spark, SF_DIR_ORACLE, "documents")
    # embed the documents by reusing the embeddings table keyed to
    # doc ids: vec_id i <-> doc_id of the i-th document
    d = docs.select("doc_id", "text").orderBy("doc_id").limit(500)
    ids = [r.doc_id for r in d.select("doc_id").collect()]
    vecs = embeddings.orderBy("vec_id").collect()
    rows = [
        (int(ids[i]), [float(x) for x in vecs[i].embedding])
        for i in range(min(len(ids), len(vecs)))
    ]
    dvec = spark.createDataFrame(
        rows, "doc_id long, embedding array<float>"
    )
    idx = VectorIndex(
        spark, str(tmp_path / "idx"), id_col="doc_id", iters=2
    )
    idx.fit(dvec, seed_col=None)
    idx.add(dvec)

    # the "benchmark": verbatim copies of three indexed documents
    bench = d.filter(F.col("doc_id").isin(ids[:3])).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    n = decontaminate_index(
        idx, d, bench, bench_id_col="bench_id", n=5
    )
    assert n >= 3
    assert idx.stats()["tomb_docs"] == n
    # idempotent: same benchmark, same gates -> manifest no-op
    assert decontaminate_index(
        idx, d, bench, bench_id_col="bench_id", n=5
    ) == n
