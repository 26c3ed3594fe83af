"""Retention measurement for whole-sequence contamination removal vs
doc-span masking (r13 — VERDICT r12 #5 / roadmap #3).

`sequences_containing` removes the WHOLE packed sequence when one
constituent document is contaminated; a read-side doc_spans mask would
keep the packed neighbors at the cost of loader complexity. Before
building the mask, measure what whole-sequence removal actually COSTS:
for contamination rates spanning the realistic range (0.1% / 0.5% / 2%
of documents), pack the corpus at production-shaped parameters
(chunk 512 tokens, sequence budget 2048 — the GPT-2/LLaMA-era context
fill) and report

- frac_seqs_lost: packed sequences removed whole;
- frac_tokens_lost: corpus tokens removed by whole-sequence removal;
- frac_tokens_contaminated: tokens a doc-span mask would HAVE to drop
  anyway (the contaminated documents' own chunks);
- collateral: the difference — the ONLY tokens masking can save.

The decision rule (ROADMAP #3): build the mask only if collateral is
material (> 0.5% of corpus tokens) at realistic contamination rates.

One Spark job per scale: the three rates share a single per-sequence
aggregate (three independent deterministic id-residue flags).

Run: python tools/mask_retention_measure.py [label=dir ...]
(defaults to sf0.1 + /tmp/gus_sf1 + /tmp/gus_sf10 when present).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402

#: (label, modulus) — deterministic contamination sets of ~1/m docs
RATES = [("0.1%", 997), ("0.5%", 199), ("2%", 53)]

CHUNK_TOKENS = 512
OVERLAP = 64
SEQ_BUDGET = 2048
SHARDS = 64


def measure(spark, sf_dir: str) -> dict:
    from gus_spark.operators.chunk import (
        chunk_documents,
        pack_sequences,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    chunks = chunk_documents(
        docs, max_tokens=CHUNK_TOKENS, overlap=OVERLAP
    )
    packed = pack_sequences(
        chunks, budget=SEQ_BUDGET, shards=SHARDS
    )
    flags = [
        (F.col("doc_id") % m == 7).cast("long").alias(f"_f{i}")
        for i, (_lbl, m) in enumerate(RATES)
    ]
    per_seq = (
        packed.select(
            "shard", "seq_id", "doc_id", "n_chunk_tokens", *flags
        )
        .groupBy("shard", "seq_id")
        .agg(
            F.sum("n_chunk_tokens").alias("seq_tok"),
            *[
                F.max(f"_f{i}").alias(f"hit{i}")
                for i in range(len(RATES))
            ],
            *[
                F.sum(
                    F.col("n_chunk_tokens") * F.col(f"_f{i}")
                ).alias(f"cont_tok{i}")
                for i in range(len(RATES))
            ],
        )
    )
    row = per_seq.agg(
        F.count(F.lit(1)).alias("n_seqs"),
        F.sum("seq_tok").alias("total_tok"),
        *[
            F.sum(F.col(f"hit{i}")).alias(f"seqs_lost{i}")
            for i in range(len(RATES))
        ],
        *[
            F.sum(F.col("seq_tok") * F.col(f"hit{i}")).alias(
                f"tok_lost{i}"
            )
            for i in range(len(RATES))
        ],
        *[
            F.sum(F.col(f"cont_tok{i}")).alias(f"tok_cont{i}")
            for i in range(len(RATES))
        ],
    ).first()
    n_docs = docs.count()
    out = {
        "n_docs": n_docs,
        "n_seqs": int(row["n_seqs"]),
        "total_tokens": int(row["total_tok"]),
        "seq_budget": SEQ_BUDGET,
        "chunk_tokens": CHUNK_TOKENS,
    }
    for i, (lbl, m) in enumerate(RATES):
        lost = int(row[f"tok_lost{i}"])
        cont = int(row[f"tok_cont{i}"])
        tot = int(row["total_tok"])
        out[lbl] = {
            "docs_flagged": n_docs // m if n_docs else 0,
            "frac_seqs_lost": round(
                int(row[f"seqs_lost{i}"]) / int(row["n_seqs"]), 5
            ),
            "frac_tokens_lost": round(lost / tot, 5),
            "frac_tokens_contaminated": round(cont / tot, 5),
            "collateral": round((lost - cont) / tot, 5),
        }
    return out


def main() -> None:
    from gus_spark.session import get_spark

    spark = get_spark(app_name="gus_spark-mask-retention")
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
        json.dumps(
            {label: measure(spark, d) for label, d in dirs.items()}
        )
    )


if __name__ == "__main__":
    main()
