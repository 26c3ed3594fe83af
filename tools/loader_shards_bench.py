"""Decade scaling for the training-loader boundary
(operators/splits.py write_training_shards / iter_training_order):
writer wall (the one shard-keyed exchange + partitioned write),
manifest receipt cost, and HOST-side sequential read throughput of
the materialized order — the loader's actual consumption rate — at
sf0.1 / sf1 / sf10 (decades present on disk).

The scale claims under test:
- writer wall is ONE exchange deep: it should scale with rows (the
  sort per (split, shard) task is rows/shards-bounded), never with
  shard count;
- reader throughput (rows/s through iter_training_order) is flat
  across decades — it is a sequential pyarrow scan whose memory is
  one record batch, so corpus size must not appear;
- a resume from the 90th percentile cursor touches only the tail
  shards (wall ~ a tenth of the full pass, not a scan of the corpus).

Run: python tools/loader_shards_bench.py [label=dir ...]
(default 0.1=/root/testdata/sf0.1 + /tmp/gus_sf1 + /tmp/gus_sf10
when present). One JSON line per run.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SHARDS = 32


def bench(spark, sf_dir: str) -> dict:
    from gus_spark.operators.splits import (
        iter_training_order,
        write_training_shards,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    dest = tempfile.mkdtemp(prefix="lsb_")
    try:
        t0 = time.time()
        manifest = write_training_shards(docs, dest, shards=SHARDS)
        write_s = round(time.time() - t0, 2)

        t0 = time.time()
        rows = 0
        cursors = []
        for batch, cur in iter_training_order(dest, "train"):
            rows += batch.num_rows
            cursors.append(cur)
        read_s = round(time.time() - t0, 3)

        # resume at ~90%: wall should track the remaining tail, not
        # the corpus
        cut = cursors[int(len(cursors) * 0.9)] if cursors else (-1, 0)
        t0 = time.time()
        tail_rows = sum(
            b.num_rows
            for b, _c in iter_training_order(dest, "train", cursor=cut)
        )
        resume_s = round(time.time() - t0, 3)

        # epoch reshuffle (r12): a NEW epoch read over the SAME shard
        # set — the claim is that it costs a read (plus the host-side
        # permutation work), never the write_s-deep rewrite a reseeded
        # write_training_shards run would cost; compare epoch1_read_s
        # against read_s (same-order) and write_s (the avoided cost)
        t0 = time.time()
        e1_rows = sum(
            b.num_rows
            for b, _c in iter_training_order(dest, "train", epoch=1)
        )
        epoch1_read_s = round(time.time() - t0, 3)
        assert e1_rows == rows, (e1_rows, rows)

        # rank sharding (r12): per-rank read walls at world_size=4 —
        # the multi-worker claim is that each rank's wall tracks its
        # quarter of the rows (disjoint shard slices, no coordination)
        t0 = time.time()
        rank_rows = [
            sum(
                b.num_rows
                for b, _c in iter_training_order(
                    dest, "train", epoch=1, rank=r, world_size=4
                )
            )
            for r in range(4)
        ]
        ranks4_read_s = round(time.time() - t0, 3)
        assert sum(rank_rows) == rows, (rank_rows, rows)

        # prefetch (r12): the same epoch-1 read with a 4-batch
        # background read-ahead — IO/compute overlap; identical rows
        t0 = time.time()
        pf_rows = sum(
            b.num_rows
            for b, _c in iter_training_order(
                dest, "train", epoch=1, prefetch_batches=4
            )
        )
        prefetch_read_s = round(time.time() - t0, 3)
        assert pf_rows == rows

        # generation compaction (r13): grow the set to 9 generations
        # of appends (the run_live(publish=...) steady state), read —
        # the per-file open cost the accumulation adds — then
        # compact_generations back to 1 and read again. The claim:
        # the compacted read recovers the single-generation wall
        # (fragmented_read_s > compacted_read_s at any sf where the
        # per-file overhead is visible), and compact_s is bounded by
        # the folded bytes (~ write_s, never more).
        from gus_spark.operators.splits import (
            append_training_shards,
            compact_generations,
        )

        n_gens = 8
        slices = docs.select("doc_id").randomSplit(
            [1.0] * n_gens, seed=7
        )
        for k, extra in enumerate(slices):
            # offset into a disjoint id range: the append contract is
            # rows NOT already in the set
            tagged = extra.selectExpr(
                f"doc_id + {(k + 1) * 10**10}L as doc_id"
            )
            append_training_shards(tagged, dest, verify=False)
        t0 = time.time()
        frag_rows = sum(
            b.num_rows
            for b, _c in iter_training_order(dest, "train")
        )
        fragmented_read_s = round(time.time() - t0, 3)
        t0 = time.time()
        compact_generations(spark, dest, max_generations=1,
                            verify=False)
        compact_s = round(time.time() - t0, 2)
        t0 = time.time()
        comp_rows = sum(
            b.num_rows
            for b, _c in iter_training_order(dest, "train")
        )
        compacted_read_s = round(time.time() - t0, 3)
        assert comp_rows == frag_rows, (comp_rows, frag_rows)

        # masked-read attach cost (r13): a masks.parquet sidecar over
        # ~1% of ids (written directly — the semantic path needs
        # doc_spans rows; this probes the LOADER cost: one dict
        # lookup + column append per batch). Claim: masked_read_s ≈
        # compacted_read_s — masking is free at the read boundary.
        import pyarrow as pa
        import pyarrow.parquet as pq

        masked_ids = sorted(
            r["doc_id"]
            for r in spark.read.parquet(os.path.join(dest, "data"))
            .select("doc_id")
            .filter("doc_id % 97 = 0")
            .distinct()
            .collect()
        )
        span_t = pa.list_(
            pa.struct([("start", pa.int64()), ("len", pa.int64())])
        )
        pq.write_table(
            pa.table(
                {
                    "id": pa.array(masked_ids),
                    "spans": pa.array(
                        [[{"start": 1, "len": 1}]] * len(masked_ids),
                        type=span_t,
                    ),
                }
            ),
            os.path.join(dest, "masks.parquet"),
        )
        t0 = time.time()
        got_masked = 0
        for b, _c in iter_training_order(dest, "train"):
            col = b.column("masked_spans")
            got_masked += b.num_rows - col.null_count
        masked_read_s = round(time.time() - t0, 3)
        assert got_masked > 0

        # mixture read (r13): weighted two-component sampling via
        # iter_mixture — the big set plus a small "high-quality"
        # component drawn at 4:1, one corpus-pass-equivalent of
        # steps. Claim: the mixture wall tracks the underlying
        # sequential reads (the per-step schedule draw and cursor
        # snapshot are O(components), invisible next to IO).
        from gus_spark.operators.splits import iter_mixture

        dest_hq = tempfile.mkdtemp(prefix="lsb_hq_")
        try:
            hq = docs.filter("doc_id % 10 = 0").selectExpr(
                "doc_id + 50000000000000L as doc_id", "text"
            )
            write_training_shards(
                hq, dest_hq, shards=4, weights={"train": 1.0},
                verify=False,
            )
            steps = max(1, rows // 4096)
            t0 = time.time()
            mix_rows = 0
            for _n, b, _cur in iter_mixture(
                {"web": (dest, 4.0), "hq": (dest_hq, 1.0)},
                "train",
                max_steps=steps,
            ):
                mix_rows += b.num_rows
            mixture_read_s = round(time.time() - t0, 3)
        finally:
            shutil.rmtree(dest_hq, ignore_errors=True)

        # token-id variant (r11): the same boundary fed trainer input
        # — each stage timed separately so the encode cost is
        # ATTRIBUTED, not folded into the write. The encode is
        # materialized via a noop sink (full kernel, no driver
        # serialization), then the shard write re-runs it inside the
        # one exchange — write_tok_s minus encode_s is the marginal
        # shard cost of carrying ids instead of text.
        from gus_spark.operators.bpe import (
            bpe_base_symbols,
            bpe_encode_ids,
            bpe_fit,
            bpe_vocab,
        )

        t0 = time.time()
        merges = bpe_fit(docs, num_merges=64)
        vocab = bpe_vocab(merges, bpe_base_symbols(docs))
        fit_s = round(time.time() - t0, 2)

        enc = bpe_encode_ids(docs, merges, vocab)
        t0 = time.time()
        enc.write.mode("overwrite").format("noop").save()
        encode_s = round(time.time() - t0, 2)

        dest_tok = tempfile.mkdtemp(prefix="lsb_tok_")
        try:
            t0 = time.time()
            m_tok = write_training_shards(
                enc, dest_tok, shards=SHARDS, verify=False
            )
            write_tok_s = round(time.time() - t0, 2)
            t0 = time.time()
            tok_rows = sum(
                b.num_rows
                for b, _c in iter_training_order(dest_tok, "train")
            )
            read_tok_s = round(time.time() - t0, 3)
        finally:
            shutil.rmtree(dest_tok, ignore_errors=True)

        return {
            "n_rows": manifest["total_rows"],
            "write_s": write_s,
            "read_s": read_s,
            "read_rows_per_s": round(rows / read_s) if read_s else None,
            "resume_p90_s": resume_s,
            "resume_rows": tail_rows,
            "epoch1_read_s": epoch1_read_s,
            "epoch1_rows_per_s": (
                round(rows / epoch1_read_s) if epoch1_read_s else None
            ),
            "ranks4_read_s": ranks4_read_s,
            "ranks4_rows": rank_rows,
            "prefetch_read_s": prefetch_read_s,
            "gens9_read_s": fragmented_read_s,
            "gens9_rows": frag_rows,
            "compact_s": compact_s,
            "compacted_read_s": compacted_read_s,
            "masked_read_s": masked_read_s,
            "masked_rows": got_masked,
            "mixture_read_s": mixture_read_s,
            "mixture_rows": mix_rows,
            "mixture_rows_per_s": (
                round(mix_rows / mixture_read_s)
                if mixture_read_s
                else None
            ),
            "bpe_fit_s": fit_s,
            "encode_s": encode_s,
            "write_tok_s": write_tok_s,
            "read_tok_s": read_tok_s,
            "tok_rows": tok_rows,
            "tok_rows_total": m_tok["total_rows"],
        }
    finally:
        shutil.rmtree(dest, ignore_errors=True)


def main() -> None:
    from gus_spark.session import get_spark

    spark = get_spark(app_name="gus_spark-loader-shards-bench")
    dirs: dict[str, str] = {}
    if len(sys.argv) > 1:
        for arg in sys.argv[1:]:
            label, d = arg.split("=", 1)
            dirs[label] = d
    else:
        dirs["0.1"] = os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
        )
        for label, d in (("1", "/tmp/gus_sf1"), ("10", "/tmp/gus_sf10")):
            if os.path.isdir(d):
                dirs[label] = d
    print(
        json.dumps({label: bench(spark, d) for label, d in dirs.items()})
    )


if __name__ == "__main__":
    main()
