"""Measure the POSTING and MINHASH index delete tiers across decades
(sf1 = 50k docs, and sf10 = 500k docs when /tmp/gus_sf10 exists or
SPARK_GRAFT_SF10_DIR points at one) — the two siblings of the vector
tier tools/vector_delete_bench.py covers, completing VERDICT r9 ask
#3's "all three tiers".

Per tier and decade, the same lifecycle the vector bench times:

- posting: build the bucketed BM25 index, topk clean (min-of-3),
  tombstone ~14% of the corpus, topk tombed (the per-query anti-join
  + totals-subtraction tax), compact (fold), topk folded.
- minhash: index the corpus via add_and_find at ngram=3 — the
  catalog operators' own shingle unit; the r10 run's ngram=1 default
  was the DEGENERATE regime on this synthetic corpus (unrelated docs
  share token SETS, so banding went near-all-pairs: the "247 s sf1
  build" and the sf10 within-batch-verification JVM overflow were
  both that, not index cost — root-caused in
  tools/minhash_ingest_profile.py). Ingest still runs in id-keyed
  batches past 100k docs (the index's real usage shape: it exists
  for batch-wise arrival) — then time what the INGEST path
  pays: a fresh small batch's add_and_find against the clean corpus,
  against the corpus with live tombstones (both corpus-side tables
  anti-joined per add), and after maintain folds the tombstones
  physically.

The scale claim under test is the same one the vector bench pins:
tombstone serving cost is the clean cost plus a broadcast anti-join
on ids, bounded by the maintain(max_tomb_frac) compaction contract —
never by index age or corpus size — and the fold is one linear
rewrite of live rows. Local wall is fixed-cost dominated; read the
DELTAS (tombed minus clean, folded vs clean) per decade.

TRIGGER PROBES (r10, the vector tier's long-lived scenario for the
siblings): successive ~4.2% delete batches with maintain(max_tomb_
frac=0.2) after each, file/delta-count triggers disabled so only the
fraction drives folding. Per step: the live tombstone fraction,
whether maintain folded, and the serving/ingest cost before (the tax
the trigger bounds) and after a fold. Runs at sf1 — the policy is
scale-independent and the vector probe already pinned the fraction
behavior at the largest decade.

Run: python tools/delete_tiers_bench.py [label=dir ...]
(default: 1=/tmp/gus_sf1 plus 10=/tmp/gus_sf10 when present; passing
explicit label=dir pairs scopes a run to chosen decades so a crash at
one never loses the other's numbers. Pass trigger=dir to ALSO run
the trigger probes on that decade.)
One JSON line: {posting: {sf: {...}}, minhash: {sf: {...}},
trigger_posting: [...], trigger_minhash: [...]}.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

DELETE_MOD = 7  # delete ids where doc_id % 7 == 3 (~14%)
QUERY = ["row", "column", "sort", "join", "hash"]


def _min_of(n: int, fn) -> float:
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        fn()
        best = min(best, time.time() - t0)
    return round(best, 3)


def bench_posting(spark, sf_dir: str, label: str, out: dict) -> None:
    from gus_spark.operators.posting_index import PostingIndex

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    root = tempfile.mkdtemp(prefix=f"pdb_{label}_")
    try:
        idx = PostingIndex(spark, root)
        t0 = time.time()
        # catalog table names can't contain '.', so sanitize the label
        idx.build(docs, name=f"delbench_{label.replace('.', '_')}")
        build = time.time() - t0

        def _topk():
            idx.topk(QUERY, 10).write.mode("overwrite").format(
                "noop"
            ).save()

        topk_clean = _min_of(3, _topk)
        dead = docs.filter(
            F.col("doc_id") % DELETE_MOD == 3
        ).select("doc_id")
        t0 = time.time()
        n_dead = idx.delete(dead, batch_key="d0")
        delete_s = time.time() - t0
        topk_tombed = _min_of(3, _topk)
        t0 = time.time()
        idx.compact()
        compact_s = time.time() - t0
        topk_folded = _min_of(3, _topk)
        out[label] = {
            "build": round(build, 3),
            "topk_clean": topk_clean,
            "delete": round(delete_s, 3),
            "topk_tombed": topk_tombed,
            "compact": round(compact_s, 3),
            "topk_folded": topk_folded,
            "n_docs": docs.count(),
            "n_dead": n_dead,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def bench_minhash(spark, sf_dir: str, label: str, out: dict) -> None:
    from gus_spark.operators.dedup import MinHashIndex

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # the probe batch an ingest pays for: 200 fresh docs (ids offset
    # past the corpus, texts word-salted so they collide with nothing
    # — the timing isolates the corpus-side anti-join, not pair volume)
    max_id = docs.agg(F.max("doc_id")).first()[0]
    probe = docs.limit(200).select(
        (F.col("doc_id") + max_id + 1).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.trim("text"), r"\s+"),
                lambda w: F.concat(w, F.lit("_probe")),
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint()
    root = tempfile.mkdtemp(prefix=f"mdb_{label}_")
    try:
        # ngram=3 = the catalog regime; n=1 is degenerate here (module
        # docstring)
        idx = MinHashIndex(spark, root, ngram=3)
        n_docs = docs.count()
        n_batches = 4 if n_docs > 100_000 else 1
        t0 = time.time()
        for b in range(n_batches):
            part = (
                docs
                if n_batches == 1
                else docs.filter(F.col("doc_id") % n_batches == b)
            )
            idx.add_and_find(part, batch_key=f"b{b}").count()
        build = time.time() - t0

        def _add(key: str) -> float:
            t = time.time()
            idx.add_and_find(probe, batch_key=key).count()
            return round(time.time() - t, 3)

        add_clean = _add("p_clean")
        dead = docs.filter(
            F.col("doc_id") % DELETE_MOD == 3
        ).select("doc_id")
        t0 = time.time()
        n_dead = idx.delete(dead, batch_key="d0")
        delete_s = time.time() - t0
        add_tombed = _add("p_tombed")
        t0 = time.time()
        idx.maintain(max_files=0)  # force the fold
        compact_s = time.time() - t0
        add_folded = _add("p_folded")
        out[label] = {
            "build": round(build, 3),
            "add_clean": add_clean,
            "delete": round(delete_s, 3),
            "add_tombed": add_tombed,
            "compact": round(compact_s, 3),
            "add_folded": add_folded,
            "n_docs": docs.count(),
            "n_dead": n_dead,
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def trigger_posting(
    spark, sf_dir: str, steps: int = 6, max_tomb_frac: float = 0.2
) -> list[dict]:
    """Long-lived PostingIndex: ``steps`` successive ~4.2% delete
    batches, maintain(max_tomb_frac) after each (delta-count trigger
    disabled). Per step: live tombstone fraction before maintain,
    whether it folded, topk seconds before/after."""
    from gus_spark.operators.posting_index import PostingIndex

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="pdb_trigger_")
    steps_out: list[dict] = []
    try:
        idx = PostingIndex(spark, root)
        idx.build(docs, name="delbench_trigger")

        def _topk() -> float:
            best = float("inf")
            for _ in range(2):
                t0 = time.time()
                idx.topk(QUERY, 10).write.mode("overwrite").format(
                    "noop"
                ).save()
                best = min(best, time.time() - t0)
            return round(best, 3)

        for i in range(steps):
            dead = docs.filter(
                F.col("doc_id") % (steps * 4) == i
            ).select("doc_id")
            idx.delete(dead, batch_key=f"d{i}")
            s = idx.stats()
            frac = s["tomb_docs"] / max(n_docs, 1)
            before = _topk()
            idx.maintain(max_deltas=10_000, max_tomb_frac=max_tomb_frac)
            # a fold clears every live tombstone; each step just added
            # one, so tomb_docs == 0 after maintain iff it compacted
            folded = idx.stats()["tomb_docs"] == 0
            steps_out.append(
                {
                    "step": i,
                    "tomb_frac": round(frac, 4),
                    "topk_tombed": before,
                    "folded": folded,
                    "topk_after": _topk() if folded else None,
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return steps_out


def trigger_minhash(
    spark, sf_dir: str, steps: int = 6, max_tomb_frac: float = 0.2
) -> list[dict]:
    """Long-lived MinHashIndex: the same scenario on the fingerprint
    tier; the serving cost measured is what INGEST pays — a fresh
    disjoint probe batch's add_and_find per step (both corpus tables
    anti-joined against the live tombstones)."""
    from gus_spark.operators.dedup import MinHashIndex

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    max_id = docs.agg(F.max("doc_id")).first()[0]
    root = tempfile.mkdtemp(prefix="mdb_trigger_")
    steps_out: list[dict] = []
    try:
        idx = MinHashIndex(spark, root, ngram=3)
        n_batches = 4 if n_docs > 100_000 else 1
        for b in range(n_batches):
            part = (
                docs
                if n_batches == 1
                else docs.filter(F.col("doc_id") % n_batches == b)
            )
            idx.add_and_find(part, batch_key=f"b{b}").count()

        def _probe(step: int) -> float:
            # fresh ids + fresh salt per step: never collides with the
            # corpus or an earlier probe, so the timing is the
            # anti-join + candidate machinery, not pair volume
            p = docs.limit(200).select(
                (F.col("doc_id") + max_id + 1 + step * 1000).alias(
                    "doc_id"
                ),
                F.array_join(
                    F.transform(
                        F.split(F.trim("text"), r"\s+"),
                        lambda w: F.concat(w, F.lit(f"_pr{step}")),
                    ),
                    " ",
                ).alias("text"),
            )
            t0 = time.time()
            idx.add_and_find(p, batch_key=f"probe{step}").count()
            return round(time.time() - t0, 3)

        for i in range(steps):
            dead = docs.filter(
                F.col("doc_id") % (steps * 4) == i
            ).select("doc_id")
            idx.delete(dead, batch_key=f"d{i}")
            tomb_docs = sum(idx._read_meta()["tombs"].values())
            frac = tomb_docs / max(n_docs, 1)
            before = _probe(i)
            m = idx.maintain(
                max_files=10_000, max_tomb_frac=max_tomb_frac
            )
            folded = bool(m.get("compacted"))
            steps_out.append(
                {
                    "step": i,
                    "tomb_frac": round(frac, 4),
                    "add_tombed": before,
                    "folded": folded,
                    "add_after": _probe(100 + i) if folded else None,
                }
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return steps_out


def main() -> None:
    from gus_spark.session import get_spark

    spark = get_spark(app_name="gus_spark-delete-tiers-bench")
    dirs: dict[str, str] = {}
    trigger_dir: str | None = None
    if len(sys.argv) > 1:
        for arg in sys.argv[1:]:
            label, d = arg.split("=", 1)
            if label == "trigger":
                trigger_dir = d
            else:
                dirs[label] = d
    else:
        sf1_dir = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/gus_sf1")
        if not os.path.isdir(sf1_dir):
            from tools.make_sf1 import make_sf1

            make_sf1(spark, sf1_dir)
        dirs["1"] = sf1_dir
        sf10_dir = os.environ.get(
            "SPARK_GRAFT_SF10_DIR", "/tmp/gus_sf10"
        )
        if os.path.isdir(sf10_dir):
            dirs["10"] = sf10_dir
    out: dict[str, dict] = {"posting": {}, "minhash": {}}
    for label, d in dirs.items():
        for tier, fn in (
            ("posting", bench_posting),
            ("minhash", bench_minhash),
        ):
            # fault-isolate each tier x decade: one OOM'd build must
            # not lose every other cell's numbers
            try:
                fn(spark, d, label, out[tier])
            except Exception as ex:  # noqa: BLE001
                out[tier][label] = {
                    "error": f"{type(ex).__name__}: {str(ex)[:200]}"
                }
    if trigger_dir is not None:
        for key, probe in (
            ("trigger_posting", trigger_posting),
            ("trigger_minhash", trigger_minhash),
        ):
            try:
                out[key] = probe(spark, trigger_dir)
            except Exception as ex:  # noqa: BLE001
                out[key] = [
                    {"error": f"{type(ex).__name__}: {str(ex)[:200]}"}
                ]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
