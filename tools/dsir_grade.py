"""DSIR tier-agreement grade: exact-token tier vs hashed fixed-model
tier at a given scale factor.

The hashed tier (operators/dsir.py) is the 100-TB path; its contract
is that at collision-free bucket counts it RANKS like the exact tier.
tests/test_dsir.py pins that at sf0.01 (31-term vocabulary); this tool
grades it at larger corpora where the salted vocabulary grows 10× per
decade (310 terms at sf1, 3100 at sf10), the regime where hash
collisions could actually start to bite.

Reported per (sf, B):
- topk_overlap: |exact T=0 top-k ∩ hashed T=0 top-k| / k
- en_frac_exact / en_frac_hashed: target-language skew of each top-k
  (the selection property a user cares about)
- vocab, docs: corpus shape for context

Run: python tools/dsir_grade.py [sf_dir] [k] [b_logs]
b_logs is a comma list of log2 bucket counts, with the literal entry
"auto" grading the auto_buckets derivation (the round-8 default).
Default "12,16,20,auto" — every B value the COVERAGE grades cite is
reproducible by running the tool as-is. Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

K_DEFAULT = 200


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    k = int(sys.argv[2]) if len(sys.argv) > 2 else K_DEFAULT
    b_specs = (
        sys.argv[3] if len(sys.argv) > 3 else "12,16,20,auto"
    ).split(",")

    from gus_spark.operators.dsir import (
        auto_buckets,
        dsir_select,
        dsir_select_hashed,
    )
    from gus_spark.queries import table
    from gus_spark.session import get_spark

    spark = get_spark()
    docs = table(spark, sf_dir, "documents")
    is_en = F.col("lang") == "en"
    n_docs = docs.count()
    vocab = (
        docs.filter(F.col("text").isNotNull())
        .select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .agg(F.countDistinct("w"))
        .first()[0]
    )

    out: dict = {"sf_dir": sf_dir, "docs": n_docs, "vocab": vocab, "k": k}
    exact = dsir_select(
        docs, is_en, k=k, temperature=0.0, carry_cols=("lang",)
    ).toPandas()
    e_ids = set(exact["doc_id"])
    # every ratio below uses the EXACT tier's returned row count as
    # the denominator: on a corpus smaller than k both tiers return
    # len(corpus) rows, and mixing /k with /len(rows) would deflate
    # only the hashed metrics
    k_eff = len(exact)
    out["k_effective"] = k_eff
    out["en_frac_exact"] = round(float((exact["lang"] == "en").mean()), 4)

    for spec in b_specs:
        if spec.strip() == "auto":
            b = auto_buckets(docs)
            out["auto_b"] = b
            tag = f"auto{b}"
        else:
            b = 1 << int(spec)
            tag = str(b)
        hashed = dsir_select_hashed(
            docs, is_en, k=k, buckets=b, temperature=0.0
        ).toPandas()
        h_ids = set(hashed["doc_id"])
        # filter with the ids' NATIVE type — hashed_scores keeps the
        # id column's input type, which may be string/UUID, and an
        # int() cast would crash there (round-8 review fix)
        langs = {
            r["doc_id"]: r["lang"]
            for r in docs.select("doc_id", "lang")
            .filter(F.col("doc_id").isin(list(h_ids)))
            .collect()
        }
        out[f"topk_overlap_b{tag}"] = round(
            len(e_ids & h_ids) / k_eff, 4
        )
        out[f"en_frac_hashed_b{tag}"] = round(
            sum(1 for i in h_ids if langs.get(i) == "en") / len(hashed), 4
        )

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
