"""Validation of the approximate operators against exact ground truth:
MinHash+LSH vs exact Jaccard pairs, SimHash hamming vs near-dups, ANN
LSH recall vs brute-force cosine."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR_ORACLE

from gus_spark.operators.dedup import (
    minhash_lsh_pairs,
    simhash_neardup_pairs,
    simhash_signatures,
)
from gus_spark.operators.similarity import ann_lsh_topk
from gus_spark.queries import catalog, table


@pytest.fixture(scope="module")
def documents(spark):
    return table(spark, SF_DIR_ORACLE, "documents")


@pytest.fixture(scope="module")
def exact_pairs(spark):
    """Exact 3-gram-shingle Jaccard >= 0.8 pairs — LSH ground truth."""
    df = catalog()["dedup_jaccard_pairs"].fn(spark, SF_DIR_ORACLE)
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_lsh_finds_exact_pairs(spark, documents, exact_pairs):
    got = {
        (r.doc_a, r.doc_b)
        for r in minhash_lsh_pairs(documents, threshold=0.8, ngram=3).collect()
    }
    # verification step makes every returned pair truly >= threshold
    assert got <= exact_pairs
    # banding (8 bands of 4) catches >=0.8-Jaccard pairs w.h.p.
    if exact_pairs:
        recall = len(got & exact_pairs) / len(exact_pairs)
        assert recall >= 0.9, f"LSH recall {recall}"


def test_simhash_signature_shape(spark, documents):
    sig = simhash_signatures(documents)
    rows = sig.collect()
    assert len(rows) == documents.count()
    assert all(isinstance(r.simhash, int) for r in rows)


def test_simhash_near_dups_have_small_hamming(spark, documents, exact_pairs):
    """High-shingle-Jaccard pairs should mostly collide within small
    hamming distance (measured: 22/25 within 12 bits at sf0.01)."""
    got = {
        (r.id_a, r.id_b)
        for r in simhash_neardup_pairs(documents, max_hamming=12).collect()
    }
    if exact_pairs:
        recall = len(got & exact_pairs) / len(exact_pairs)
        assert recall >= 0.8, f"simhash recall {recall}"


def test_ann_lsh_recall_vs_brute_force(spark):
    e = table(spark, SF_DIR_ORACLE, "embeddings")
    ann = ann_lsh_topk(e, k=5)
    got = {
        (r.query_id, r.neighbor_id) for r in ann.filter(F.col("rank") <= 1).collect()
    }
    assert got, "ANN produced no neighbors"
    # brute-force nearest neighbor for the queried ids
    brute = catalog()["similarity_neardup_pairs"].fn(spark, SF_DIR_ORACLE)
    near = {(r.vec_a, r.vec_b) for r in brute.collect()}
    near |= {(b, a) for a, b in near}
    if near:
        # every >=0.95-cosine pair should be each other's ANN candidate
        # (same bucket) for most pairs
        hits = sum(1 for p in near if p in got)
        assert hits / len(near) >= 0.5, f"ANN near-dup hit rate {hits/len(near)}"


def test_stratified_sample_rates(spark):
    """Per-stratum sample rates should track the requested fractions."""
    from pyspark.sql import functions as F

    base = table(spark, SF_DIR_ORACLE, "orders")
    sample = catalog()["stratified_sample_orders"].fn(spark, SF_DIR_ORACLE)
    totals = {r.o_orderstatus: r.n for r in
              base.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    got = {r.o_orderstatus: r.n for r in
           sample.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()}
    assert got.get("P", 0) == totals["P"]  # fraction 1.0 keeps every row
    for status, frac in [("F", 0.1), ("O", 0.1)]:
        rate = got.get(status, 0) / totals[status]
        assert abs(rate - frac) < 0.05, (status, rate)
    # reproducible with the same seed
    again = catalog()["stratified_sample_orders"].fn(spark, SF_DIR_ORACLE)
    assert again.count() == sample.count()


def test_ivf_recall_vs_brute_force(spark):
    from gus_spark.operators.similarity import ivf_topk

    e = table(spark, SF_DIR_ORACLE, "embeddings")
    ivf = ivf_topk(e, k=5, nprobe=2)
    got = {(r.query_id, r.neighbor_id) for r in ivf.collect()}
    assert got, "IVF produced no neighbors"
    brute = catalog()["similarity_neardup_pairs"].fn(spark, SF_DIR_ORACLE)
    near = {(r.vec_a, r.vec_b) for r in brute.collect()}
    near |= {(b, a) for a, b in near}
    if near:
        hits = sum(1 for p in near if p in got)
        recall = hits / len(near)
        assert recall >= 0.8, f"IVF near-dup recall {recall}"
