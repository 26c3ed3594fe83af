"""Index-table maintenance: streaming-style incremental adds append one
delta per batch (small-file death at 100x ingest rates); maintain() must
fold them to the target layout WITHOUT changing a single result."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR

from gus_spark.queries import table


@pytest.fixture(scope="module")
def embeddings(spark):
    return table(spark, SF_DIR, "embeddings")


def test_vector_index_maintain_compacts_without_changing_results(
    spark, embeddings, tmp_path
):
    from gus_spark.operators.vector_index import VectorIndex

    idx = VectorIndex(spark, str(tmp_path / "vidx"), m=16, iters=2)
    idx.fit(embeddings)
    # 50 streaming-sized adds -> >=50 delta dirs of tiny files
    for lo in range(0, 500, 10):
        idx.add(
            embeddings.filter(
                (F.col("vec_id") >= lo) & (F.col("vec_id") < lo + 10)
            ),
            batch_key=f"b{lo}",
        )
    health = idx.health()
    assert health["n_deltas"] == 50
    assert health["n_files"] >= 50

    queries = [
        (int(r.vec_id), [float(x) for x in r.embedding])
        for r in embeddings.limit(8).collect()
    ]
    before = {
        (r.query_id, r.neighbor_id, r.rank, round(r.adc_sim, 12))
        for r in idx.search(queries, k=5, nprobe=4).collect()
    }
    report = idx.maintain(max_files=16, target_files=4)
    assert report["compacted"]
    assert report["after"]["n_files"] <= 4
    assert report["after"]["n_deltas"] == 1
    after = {
        (r.query_id, r.neighbor_id, r.rank, round(r.adc_sim, 12))
        for r in idx.search(queries, k=5, nprobe=4).collect()
    }
    assert after == before
    assert idx.stats()["n_rows"] == 500
    # healthy table -> metadata-only no-op
    report2 = idx.maintain(max_files=16, target_files=4)
    assert not report2["compacted"]


def test_minhash_index_maintain_compacts_without_changing_results(
    spark, tmp_path
):
    from gus_spark.operators.dedup import MinHashIndex, minhash_lsh_pairs

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    full = {
        (r.doc_a, r.doc_b, round(r.jaccard, 12))
        for r in minhash_lsh_pairs(docs, threshold=0.8, ngram=1).collect()
    }

    idx = MinHashIndex(spark, str(tmp_path / "mh"), threshold=0.8, ngram=1)
    seen = set()
    # 10 incremental batches, collecting every reported pair
    for i, lo in enumerate(range(0, 500, 50)):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 50)
        )
        seen |= {
            (r.doc_a, r.doc_b, round(r.jaccard, 12))
            for r in idx.add_and_find(batch, batch_key=f"b{i}").collect()
        }
    assert seen == full
    assert idx.health()["bands_deltas"] == 10

    report = idx.maintain(max_files=8, target_files=2)
    assert report["compacted"]
    assert report["after"]["bands_files"] <= 2
    assert report["after"]["shingles_files"] <= 2

    # post-compaction adds still see the whole corpus: re-adding a doc
    # slice as a NEW batch must rediscover exactly its pairs vs corpus
    probe = docs.filter(F.col("doc_id") < 20)
    got = {
        (r.doc_a, r.doc_b)
        for r in idx.add_and_find(probe, batch_key="probe").collect()
    }
    expected = {
        (a, b) for a, b, _ in full if a < 20 or b < 20
    }
    assert got >= expected


def test_minhash_pairs_log_retention_and_legacy_rejection(spark, tmp_path):
    """pairs_log must not grow one delta per batch forever: maintain()
    prunes drained batches down to pairs_retain. And a legacy
    flat-layout parquet file in a band/shingle dir must be rejected
    loudly, not silently excluded from the corpus."""
    from gus_spark.operators.dedup import MinHashIndex

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = MinHashIndex(spark, str(tmp_path / "mh"), threshold=0.8, ngram=1)
    for i, lo in enumerate(range(0, 120, 20)):
        batch = docs.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < lo + 20)
        )
        idx.add_and_find(batch, batch_key=f"b{i}")
    assert idx.health()["pairs_deltas"] == 6

    report = idx.maintain(max_files=10_000, pairs_retain=2)  # no compaction
    assert report["pairs_pruned"] == 4
    assert report["after"]["pairs_deltas"] == 2
    # the two NEWEST batches survive
    pairs_dir = tmp_path / "mh" / "pairs_log"
    assert sorted(d.name for d in pairs_dir.iterdir()) == [
        "delta-b4", "delta-b5"
    ]
    # a pruned batch replays cleanly (recompute + rewrite its delta)
    replay = idx.add_and_find(
        docs.filter(F.col("doc_id") < 20), batch_key="b0"
    )
    assert replay.count() >= 0 and (pairs_dir / "delta-b0").is_dir()

    # legacy flat layout: a stray .parquet directly under bands/
    flat = tmp_path / "mh" / "bands" / "part-legacy.parquet"
    flat.write_bytes(b"not really parquet")
    with pytest.raises(ValueError, match="legacy flat-layout"):
        idx.add_and_find(
            docs.filter(F.col("doc_id") < 5), batch_key="b9"
        )


def test_minhash_occupancy_health_flags_degenerate_shingles(
    spark, tmp_path
):
    """health(occupancy=True): the band-bucket occupancy probe must
    SEPARATE a healthy shingle regime from a degenerate one at build
    time (late r10: ngram=1 on a shared-vocabulary corpus silently
    drove banding near-all-pairs; nothing in the index said so until
    the verify stage blew up). On the same 60 docs, ngram=1 buckets
    unrelated docs together (candidate_pairs >> docs) while ngram=3
    stays near-singleton."""
    from gus_spark.operators.dedup import MinHashIndex

    docs = table(spark, SF_DIR, "documents").limit(60)
    probes = {}
    for n in (1, 3):
        idx = MinHashIndex(
            spark, str(tmp_path / f"mh_n{n}"), ngram=n
        )
        idx.add_and_find(docs, batch_key="b0").count()
        probes[n] = idx.health(occupancy=True)["occupancy"]
    # internal consistency: rows = 32 bands x docs, buckets <= rows
    for occ in probes.values():
        assert occ["band_rows"] == 32 * 60
        assert occ["buckets"] <= occ["band_rows"]
        assert occ["mean_occupancy"] >= 1.0
    # the signal: the degenerate regime is glaring, not marginal
    assert probes[1]["candidate_pairs"] > 10 * probes[3]["candidate_pairs"] + 100
    assert probes[1]["mean_occupancy"] > 1.5
    assert probes[3]["mean_occupancy"] < 1.1
    assert probes[3]["max_bucket"] <= 3
    # empty index: probe reports None rather than failing
    empty = MinHashIndex(spark, str(tmp_path / "mh_empty"))
    assert empty.health(occupancy=True)["occupancy"] is None


def test_minhash_occupancy_excludes_live_tombstones(spark, tmp_path):
    """ADVICE r10: between a delete and the next fold, the occupancy
    probe must describe what candidate generation will actually pay —
    add_and_find anti-joins live tombstones from the corpus bands, so
    health(occupancy=True) must too."""
    from gus_spark.operators.dedup import MinHashIndex

    docs = table(spark, SF_DIR, "documents").limit(40)
    idx = MinHashIndex(spark, str(tmp_path / "mh_tomb"), ngram=3)
    idx.add_and_find(docs, batch_key="b0").count()
    before = idx.health(occupancy=True)["occupancy"]
    assert before["band_rows"] == 32 * 40
    dead = [r.doc_id for r in docs.limit(15).collect()]
    assert idx.delete(dead, batch_key="d0") == 15
    # no fold has run — the band files still hold all 40 docs' rows,
    # but the probe reports the LIVE view the serving path scans
    after = idx.health(occupancy=True)["occupancy"]
    assert after["band_rows"] == 32 * 25
    assert after["candidate_pairs"] <= before["candidate_pairs"]


def test_lsh_occupancy_flags_degenerate_embeddings(spark, embeddings):
    """lsh_bucket_occupancy (r11, VERDICT r10 ask #4): the ANN LSH
    twin of the MinHash band probe — healthy random-ish embeddings
    spread near TARGET_BUCKET_ROWS per bucket; a collapsed embedding
    column (every vector identical up to sign) lands the corpus in ONE
    bucket with ~n²/2 candidate pairs, and the probe says so before a
    scoring stage pays it."""
    from gus_spark.operators.similarity import (
        TARGET_BUCKET_ROWS,
        lsh_bucket_occupancy,
    )

    n = embeddings.count()
    healthy = lsh_bucket_occupancy(embeddings)["occupancy"]
    assert healthy["rows"] == n
    assert healthy["buckets"] > n / (4 * TARGET_BUCKET_ROWS)
    assert healthy["mean_occupancy"] < 4 * TARGET_BUCKET_ROWS
    assert healthy["candidate_pairs"] < n * n / 8

    collapsed = embeddings.select(
        "vec_id",
        F.expr("transform(embedding, x -> 1.0)").alias("embedding"),
    )
    degen = lsh_bucket_occupancy(collapsed)["occupancy"]
    assert degen["buckets"] == 1
    assert degen["mean_occupancy"] == float(n)
    assert degen["candidate_pairs"] == n * (n - 1) // 2
    # the cap bounds what scoring admits — the probe reports both
    assert degen["capped_candidate_rows"] == n * min(n, 256)

    # empty input: probe reports None rather than failing
    none = lsh_bucket_occupancy(embeddings.limit(0))
    assert none["occupancy"] is None


def test_posting_occupancy_flags_degenerate_vocabulary(spark, tmp_path):
    """PostingIndex.health(occupancy=True) (r11, VERDICT r10 ask #4):
    a real vocabulary spreads postings across (nearly) every term
    bucket; a one-term corpus concentrates them in exactly one bucket
    with max_term_df == n_docs — the regime where 'bucket-pruned'
    serving scans the corpus — and the probe separates the two. The
    live view excludes tombstoned docs (the add_and_find mirror)."""
    from gus_spark.operators.posting_index import PostingIndex

    docs = table(spark, SF_DIR, "documents").select("doc_id", "text")
    idx = PostingIndex(spark, str(tmp_path / "pidx"))
    idx.build(docs, name=f"occ_h_{os.getpid()}", n_buckets=8)
    assert idx.health() == {"gen": 0, "n_deltas": 0, "n_tombs": 0}
    healthy = idx.health(occupancy=True)["occupancy"]
    assert healthy["n_buckets"] == 8
    assert healthy["occupied_buckets"] == 8  # vocab >> buckets
    assert healthy["max_term_df"] < docs.count()
    assert healthy["max_bucket_rows"] < healthy["posting_rows"]

    mono = spark.createDataFrame(
        [(i, "aaa aaa aaa") for i in range(50)], "doc_id long, text string"
    )
    idx2 = PostingIndex(spark, str(tmp_path / "pidx_mono"))
    idx2.build(mono, name=f"occ_d_{os.getpid()}", n_buckets=8)
    degen = idx2.health(occupancy=True)["occupancy"]
    assert degen["occupied_buckets"] == 1
    assert degen["max_term_df"] == 50
    assert degen["posting_rows"] == 50  # one distinct (term, doc) each

    # tombstones leave the live view before any fold
    idx2.delete(list(range(10)), batch_key="d0")
    after = idx2.health(occupancy=True)["occupancy"]
    assert after["max_term_df"] == 40 and after["posting_rows"] == 40


def test_maintain_occupancy_knob_uniform(spark, embeddings, tmp_path):
    """maintain(occupancy=True) carries the tier's occupancy regime in
    the maintenance report on ALL THREE index families (r11 — the ops
    loop sees degeneracy without a separate probe call); default stays
    probe-free."""
    from gus_spark.operators.dedup import MinHashIndex
    from gus_spark.operators.posting_index import PostingIndex
    from gus_spark.operators.vector_index import VectorIndex

    docs = table(spark, SF_DIR, "documents").limit(30).select(
        "doc_id", "text"
    )

    mh = MinHashIndex(spark, str(tmp_path / "mh"), ngram=3)
    mh.add_and_find(docs, batch_key="b0").count()
    rep = mh.maintain(occupancy=True)
    assert rep["after"]["occupancy"]["band_rows"] == 32 * 30
    assert "occupancy" not in mh.maintain()["after"]

    pi = PostingIndex(spark, str(tmp_path / "pi"))
    pi.build(docs, name=f"occm_{os.getpid()}", n_buckets=4)
    rep = pi.maintain(occupancy=True)
    assert rep["occupancy"]["n_buckets"] == 4
    assert "occupancy" not in pi.maintain()

    vi = VectorIndex(spark, str(tmp_path / "vi"), m=16, iters=2)
    vi.fit(embeddings)
    vi.add(embeddings.limit(50), batch_key="b0")
    rep = vi.maintain(occupancy=True)
    assert rep["occupancy"]["n_rows"] == 50
    assert rep["occupancy"]["n_cells"] >= 1
    assert "occupancy" not in vi.maintain()
