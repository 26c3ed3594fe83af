"""End-to-end pipeline composition (tools/pipeline_demo.py): every
training-data stage chained on the real corpus, with structural
invariants on the stage counts and the packed output."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)
from conftest import SF_DIR_ORACLE


def test_pipeline_end_to_end(spark, tmp_path):
    from tools.pipeline_demo import run_pipeline

    out = str(tmp_path / "out")
    stats = run_pipeline(spark, SF_DIR_ORACLE, out, seq_budget=256)

    # gates only ever shrink the corpus, and nothing vanishes entirely
    order = [
        "input_docs",
        "after_decontaminate",
        "after_fuzzy_decontaminate",
        "after_neardup_dedup",
        "after_repetition_gate",
        "after_quality_gate",
    ]
    counts = [stats[k] for k in order]
    assert counts == sorted(counts, reverse=True)
    assert counts[-1] > 0
    # dedup actually removed near-duplicates on this corpus
    assert stats["after_neardup_dedup"] < stats["after_fuzzy_decontaminate"]

    # the vocabulary guard escalated past the degenerate unigram (this
    # corpus's ~31-word vocab). The stage count is honestly UNCHANGED
    # here: the only cross-corpus near-dups (J ≈ 0.97/0.99) are
    # verbatim enough that the exact 13-gram gate already dropped them
    # (standalone, fuzzy catches both — the 2b exact-substring honest-
    # zero precedent); the reformatted-copy case fuzzy uniquely
    # catches is planted and proven in test_streaming/test_decontam.
    assert stats["fuzzy_ngram"] >= 2
    assert (
        stats["after_fuzzy_decontaminate"]
        == stats["after_decontaminate"]
    )

    # boilerplate stage (2b) does real work on the line-seeded corpus
    # (r10): the banner is on every doc and the footer on every 3rd,
    # so at least ~n_deduped - 1 lines must fall to the C4 cut (the
    # canonical keeper retains one copy per flagged line)
    assert (
        stats["boilerplate_lines_removed"]
        >= stats["after_neardup_dedup"] - 1
    )

    # stage timing attribution: every stage recorded, totals add up
    assert stats["total_secs"] > 0
    assert set(stats["stage_secs"]) >= {
        "decontaminate",
        "neardup_dedup",
        "boilerplate_cut",
        "substring_dedup",
        "quality_gate",
        "mixture",
        "chunk_pack",
    }

    # DSIR report: the en-target importance signal must be real —
    # target-language survivors score above the rest on average
    assert stats["dsir_en_mean_fp"] > stats["dsir_rest_mean_fp"]

    # mixture: temperature smoothing damps the head language below its
    # natural share while every weighted language survives, and the
    # materialized token mass lands near the 75%-of-survivors budget
    shares = stats["mixture_share"]
    assert set(shares) == {"en", "zh", "de", "es", "fr"}
    assert max(shares, key=shares.get) == "en"  # still the head...
    assert shares["en"] < 0.45  # ...but damped below natural ~0.5+
    assert abs(sum(shares.values()) - 1.0) < 0.01
    assert stats["mixture_rows"] > 0

    # chunking fans out over the mixture, packing compresses
    assert stats["chunks"] >= stats["mixture_rows"]
    assert 0 < stats["sequences"] <= stats["chunks"]
    assert 0.5 <= stats["mean_fill"] <= 1.0

    packed = spark.read.parquet(os.path.join(out, "packed_sequences"))
    rows = packed.collect()
    assert len(rows) == stats["chunks"]
    # every sequence within budget; fill totals consistent
    by_seq = {}
    for r in rows:
        by_seq.setdefault((r["shard"], r["seq_id"]), []).append(r)
    for members in by_seq.values():
        total = sum(r["n_chunk_tokens"] for r in members)
        assert total <= 256
        assert all(r["seq_tokens"] == total for r in members)
    assert len(by_seq) == stats["sequences"]
