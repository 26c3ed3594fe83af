"""End-to-end training-data pipeline: every preparation stage the
engine provides, composed in the order a production corpus build runs
them, from raw documents to packed training sequences.

    raw documents
      1. decontaminate      13-gram eval-overlap anti-join (src0 plays
                            the benchmark suite)
      1b. fuzzy decontam.   MinHash near-dup match against the same
                            benchmark — reformatted copies the exact
                            gram gate waves through; shingle width
                            auto-calibrated against the corpus
                            vocabulary (calibrate_fuzzy_ngram). On
                            THIS corpus the stat is honestly 0: the
                            only cross-corpus near-dups (J ≈ .97/.99)
                            are verbatim enough that stage 1 already
                            dropped them (standalone, fuzzy catches
                            both); the reformatted-copy case is
                            planted and proven in the test suite
      2. near-dup dedup     MinHash+LSH pairs -> connected components
                            -> keep one representative per cluster
      2b. boilerplate cut   C4 line rule: lines repeated across >= 4
                            docs corpus-wide removed, canonical copy
                            kept. The raw synthetic corpus is
                            single-line (r9's stage stat was honestly
                            0), so the demo corpus is LINE-SEEDED at
                            entry — a banner line on every doc, a
                            footer on every 3rd (the catalog probe's
                            trick) — making the stage cut real lines
                            end-to-end. Runs BEFORE exact-substring
                            (r10 reorder): ExactSubstr's rebuild
                            re-joins tokens with single spaces, so
                            line structure only survives up to that
                            stage — and the line rule first is also
                            the cheaper order (ExactSubstr never
                            re-pays for spans the line cut removed)
      2c. exact-substring   Lee et al. ExactSubstr: cut repeated
                            >=k-token passages (cross-document
                            repetition neither document-level dedup
                            nor the line rule can see). On the raw
                            corpus the stat was honestly 0 (the only
                            long shared spans were whole near-dup
                            documents, which stage 2 already removed;
                            standalone the same k cuts ~1.2k tokens
                            in ~23 docs); the planted-boilerplate
                            case is proven in tests/test_substring.py
      3. repetition gate    Gopher dup-token/bigram thresholds
      4. quality gate       distilled classifier (weak heuristic
                            labels -> hashed-BoW logistic scorer)
      4c. DSIR report       hashed-tier importance scores vs the en
                            target (Xie et al. 2023) — reported, not
                            gated: a real deployment targets an
                            EXTERNAL quality corpus; the en-vs-rest
                            mean gap shows the signal end-to-end
      5. PII redaction      typed-placeholder scrubbing
      5b. data mixture      temperature-smoothed language weights
                            (XLM-R alpha) -> budget-driven plan ->
                            deterministic epochs + md5-cut sampling;
                            the mixture, not the raw survivors, is
                            what ships to packing
      6. tokenizer fit      BPE merges learned from the surviving
                            corpus's deduplicated vocabulary (token
                            budget reported under that tokenizer)
      7. chunk + pack       sliding token windows -> next-fit into
                            fixed-budget training sequences

Stage order is the standard one: cheap exact/structural filters run
before model scoring (decontamination and dedup shrink the corpus the
classifier must score), redaction runs after all content-hash stages
(scrubbing changes bytes, so fingerprints must be computed first ...
and before packaging, so nothing sensitive ships), packing runs last.

Run: python tools/pipeline_demo.py [sf_dir] [out_dir]
Prints ONE JSON line of per-stage surviving-document counts plus
packing stats AND per-stage wall seconds ("stage_secs" — each stage
boundary is a localCheckpoint/count materialization, so the
attribution is real work, not plan-building); writes the packed
sequences as parquet under out_dir.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    jaccard_threshold: float = 0.8,
    substring_k: int = 12,
    rep_max_dup_token_frac: float = 0.72,
    quality_min: float = 0.3,
    chunk_tokens: int = 64,
    chunk_overlap: int = 8,
    seq_budget: int = 256,
    pack_shards: int = 16,
) -> dict:
    from gus_spark.operators.chunk import chunk_documents, pack_sequences
    from gus_spark.operators.decontaminate import decontaminate
    from gus_spark.operators.dedup import minhash_lsh_pairs
    from gus_spark.operators.graph import connected_components
    from gus_spark.operators.quality import (
        fit_quality_classifier,
        score_quality,
    )
    from gus_spark.operators.redact import redact_pii
    from gus_spark.operators.repetition import repetition_metrics
    from gus_spark.queries import table

    import time

    stage_secs: dict[str, float] = {}
    _t = [time.time()]

    def mark(name: str) -> None:
        now = time.time()
        stage_secs[name] = round(now - _t[0], 3)
        _t[0] = now

    docs = table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")
    # line-seed the corpus (r10): the synthetic docs are single-line,
    # so the C4 stage 2c would cut 0 by construction. A banner on
    # every doc + a footer on every 3rd (the remove_boilerplate_docs
    # catalog trick) gives the stage real cross-document lines to cut
    # while leaving the doc population and ordering untouched.
    corpus = corpus.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.lit("\naccept all cookies to continue"),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("\ncopyright example corp all rights reserved"),
            ).otherwise(F.lit("")),
        ),
    )
    stats: dict = {"input_docs": corpus.count()}
    mark("input")

    # 1. decontamination
    clean = decontaminate(corpus, bench, n=13).localCheckpoint()
    stats["after_decontaminate"] = clean.count()
    mark("decontaminate")

    # 1b. fuzzy decontamination: reformatted benchmark copies that
    # break every verbatim 13-gram. The shingle width is CALIBRATED,
    # not defaulted: on this synthetic corpus the unigram vocabulary
    # is ~31 words, so unigram banding would bucket unrelated pairs
    # together and degrade the candidate join toward all-pairs — the
    # guard picks the smallest n whose background band-collision
    # probability is within budget (n=2 here; natural corpora
    # calibrate to the standard n=1). See calibrate_fuzzy_ngram.
    from gus_spark.operators.decontaminate import (
        calibrate_fuzzy_ngram,
        decontaminate_fuzzy,
    )

    fuzzy_n = calibrate_fuzzy_ngram(clean, bench)
    clean = decontaminate_fuzzy(
        clean, bench, ngram=fuzzy_n
    ).localCheckpoint()
    stats["fuzzy_ngram"] = fuzzy_n
    stats["after_fuzzy_decontaminate"] = clean.count()
    mark("fuzzy_decontaminate")

    # 2. near-dup dedup: pairs -> components -> min-id representative
    pairs = minhash_lsh_pairs(
        clean, "doc_id", "text", threshold=jaccard_threshold, ngram=3
    )
    labels = connected_components(pairs, src="doc_a", dst="doc_b")
    dropped = labels.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    deduped = clean.join(dropped, "doc_id", "left_anti").localCheckpoint()
    stats["after_neardup_dedup"] = deduped.count()
    mark("neardup_dedup")

    # 2b. boilerplate cut (C4 line rule, operators/boilerplate.py):
    # lines repeated across >= 4 documents corpus-wide are removed,
    # lowest-doc_id copy kept (the exact_substring canonical policy).
    # The entry seeding above plants the lines this stage exists to
    # cut; the planted-banner semantics are proven in
    # tests/test_boilerplate.py. MUST run before ExactSubstr, whose
    # rebuild re-joins tokens with single spaces and so flattens the
    # line structure this stage keys on. Re-attachment is a LEFT join
    # + coalesce (ADVICE r9): remove_boilerplate omits docs whose
    # text is NULL/all-blank (the filter-stage convention), and an
    # inner join would silently drop them from the pipeline.
    from gus_spark.operators.boilerplate import remove_boilerplate

    bp = remove_boilerplate(deduped.select("doc_id", "text"))
    stats["boilerplate_lines_removed"] = int(
        bp.agg(F.sum("n_lines_removed")).first()[0] or 0
    )
    deduped = (
        deduped.withColumnRenamed("text", "_text_pre_bp")
        .join(
            bp.select("doc_id", F.col("text").alias("_text_bp")),
            "doc_id",
            "left",
        )
        .withColumn(
            "text", F.coalesce(F.col("_text_bp"), F.col("_text_pre_bp"))
        )
        .drop("_text_pre_bp", "_text_bp")
        .localCheckpoint()
    )
    mark("boilerplate_cut")

    # 2c. exact-substring dedup (Lee et al. ExactSubstr): cut repeated
    # >=k-token passages neither document dedup nor the line rule can
    # see; rows survive, duplicated spans don't
    from gus_spark.operators.substring import exact_substring_dedup

    cut = exact_substring_dedup(
        deduped.select("doc_id", "text"), k=substring_k
    )
    stats["substring_cut_tokens"] = (
        cut.agg(F.sum("n_cut_tokens")).first()[0] or 0
    )
    stats["substring_docs_touched"] = cut.filter(
        F.col("n_cut_tokens") > 0
    ).count()
    deduped = (
        deduped.drop("text")
        .join(cut.select("doc_id", "text"), "doc_id")
        .localCheckpoint()
    )
    mark("substring_dedup")

    # 3. repetition gate
    rep = repetition_metrics(deduped, "doc_id", "text")
    repetitive = rep.filter(
        (F.col("n_tokens") - F.col("n_unique_tokens")).cast("double")
        / F.col("n_tokens")
        > rep_max_dup_token_frac
    ).select("doc_id")
    unrepetitive = deduped.join(
        repetitive, "doc_id", "left_anti"
    ).localCheckpoint()
    stats["after_repetition_gate"] = unrepetitive.count()
    mark("repetition_gate")

    # 4. distilled quality gate (weak labels fit on the surviving corpus)
    model = fit_quality_classifier(unrepetitive)
    scored = score_quality(unrepetitive, model)
    quality = scored.filter(
        F.col("quality_prob") >= quality_min
    ).localCheckpoint()
    stats["after_quality_gate"] = quality.count()
    # degenerate-fit guard (r10): the weak labels are stopword-keyed,
    # and a corpus whose vocabulary defeats them (e.g. the word-salted
    # scale-up decades, where 'the' became 'the_3') yields an
    # all-negative fit whose gate would erase the corpus. A gate that
    # removes 100% is a classifier failure, not a curation decision —
    # pass the survivors through and SAY so (the DSIR/LM report-guard
    # convention), so stages 5-7 still run and the stat is loud.
    stats["quality_gate_degenerate"] = False
    if stats["after_quality_gate"] == 0 and stats["after_repetition_gate"] > 0:
        quality = unrepetitive.withColumn(
            "quality_prob", F.lit(0.0)
        ).localCheckpoint()
        stats["quality_gate_degenerate"] = True
        stats["after_quality_gate"] = stats["after_repetition_gate"]
    mark("quality_gate")

    # 4b. LM perplexity (the CCNet signal, reported not gated here —
    # a real deployment fits the LM on a REFERENCE corpus like
    # wikipedia and keeps the low-perplexity head; self-fit ppl still
    # flags outlier docs)
    from gus_spark.operators.lm import fit_ngram_lm, perplexity_score

    if stats["after_quality_gate"]:
        lm = fit_ngram_lm(quality, order=3)
        # ppl is consumed TWICE (the p50 agg and the CCNet-buckets
        # chain below); without this boundary each consumer re-runs
        # the whole LM fit + scoring lineage — measured at sf10:
        # 275 s for the stage vs ~140 s with the checkpoint (the r10
        # decade table's 128 s predates the buckets chain, so the
        # doubling was invisible until the r11 re-run). One narrow
        # row per doc — the cheap end of the checkpoint trade.
        ppl = perplexity_score(quality, lm, order=3).localCheckpoint()
        p50 = ppl.agg(
            F.percentile_approx("log10_ppl", 0.5).alias("p")
        ).first()["p"]
        stats["lm_ppl_p50"] = (
            round(p50, 3) if p50 is not None else None
        )
        # CCNet head/middle/tail over the same scores (late r10) —
        # the approx tier (per-lang thresholds, no sort), the shape a
        # corpus-scale run would use; reported, not gated here
        from gus_spark.operators.lm import perplexity_buckets

        buckets = perplexity_buckets(
            ppl.join(quality.select("doc_id", "lang"), "doc_id"),
            tier="approx",
        )
        stats["ccnet_buckets"] = {
            r["bucket"]: r["n"]
            for r in buckets.groupBy("bucket")
            .agg(F.count("*").alias("n"))
            .collect()
        }
    else:  # empty corpus: fit would raise, percentile would be NULL
        stats["lm_ppl_p50"] = None
        stats["ccnet_buckets"] = {}
    mark("lm_report")

    # 4c. DSIR importance report (Xie et al. 2023) through the hashed
    # fixed-model tier — the 100-TB path: B-dim model from one
    # bucket-keyed agg, zero-shuffle per-row scoring. Reported, not
    # gated (see module doc); the en-vs-rest mean gap is the signal.
    from gus_spark.operators.dsir import hashed_logratios, hashed_scores

    # guard on TARGET presence, not just survivor presence: with zero
    # surviving en docs the fit raises (empty target sample), which a
    # report-only stage must never let abort stages 5-7
    n_en = quality.filter(
        (F.col("lang") == "en") & F.col("text").isNotNull()
    ).count()
    if n_en:
        dsir_model = hashed_logratios(
            quality, F.col("lang") == "en", buckets=1 << 14
        )
        dsir = hashed_scores(quality, dsir_model).join(
            quality.select("doc_id", "lang"), "doc_id"
        )
        gap = dsir.agg(
            F.avg(
                F.when(F.col("lang") == "en", F.col("score_fp"))
            ).alias("en"),
            F.avg(
                F.when(F.col("lang") != "en", F.col("score_fp"))
            ).alias("rest"),
        ).first()
        stats["dsir_en_mean_fp"] = (
            int(gap["en"]) if gap["en"] is not None else None
        )
        stats["dsir_rest_mean_fp"] = (
            int(gap["rest"]) if gap["rest"] is not None else None
        )
    else:
        stats["dsir_en_mean_fp"] = stats["dsir_rest_mean_fp"] = None
    mark("dsir_report")

    # 4d. boilerplate report: the most common 8-gram among survivors
    # (operators/heavyhitters.py — MG candidates + exact verify, no
    # vocabulary shuffle). A high certified count here means template
    # boilerplate the repetition gate's per-doc ratios can't see
    # (cross-document repetition); reported, not gated. Capacity is
    # CORPUS-AWARE (r10): lossless (above the distinct-8-gram count,
    # so the report is exhaustive — after dedup most 8-grams are
    # singletons, which the default capacity correctly but unhelpfully
    # for a report refuses to certify) while the corpus is small
    # enough to afford the 2^20-counter summaries; past 100k docs the
    # lossless tier is neither lossless (sf10 holds ~18M distinct
    # 8-grams) nor certifying (its floor beats any real top count) —
    # the sf10 run paid 383 s for an UNcertified guess — so the
    # default capacity's honest bounded answer is strictly better.
    from gus_spark.operators.heavyhitters import heavy_hitters

    if stats["after_quality_gate"]:
        hh_cap = (
            1 << 20 if stats["after_quality_gate"] <= 100_000 else None
        )
        hh = heavy_hitters(
            quality, k=1, ngram=8, capacity=hh_cap
        ).first()
        stats["top_8gram_count"] = int(hh["cnt"]) if hh else 0
        stats["top_8gram_certified"] = (
            bool(hh["cnt"] > hh["floor_cnt"]) if hh else None
        )
    else:
        stats["top_8gram_count"] = 0
        stats["top_8gram_certified"] = None
    mark("heavyhitter_report")

    # 5. redaction (content-hash stages are all behind us)
    redacted = redact_pii(quality.drop("quality_prob"))
    stats["pii_spans_scrubbed"] = (
        redacted.select(
            sum(
                F.sum(c)
                for c in redacted.columns
                if c.startswith("n_")
                and c
                in ("n_email", "n_ssn", "n_card", "n_ip", "n_phone")
            ).alias("s")
        ).first()["s"]
        or 0
    )
    mark("redaction")

    # 5b. data mixture: smooth the surviving language proportions with
    # XLM-R temperature sampling (alpha=0.5 — head languages damped,
    # tail languages boosted), then materialize ~75% of the surviving
    # token mass at those weights. Epoch repeats get a surrogate id so
    # downstream chunking/packing treats each pass as its own document
    # (exactly how a training loader sees them).
    from gus_spark.operators.mixing import (
        mixture_plan,
        mixture_sample,
        temperature_weights,
    )

    lang_tokens = {
        r["lang"]: r["t"]
        for r in redacted.groupBy("lang")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    mix_budget = max(1, int(0.75 * sum(lang_tokens.values())))
    weights = temperature_weights(lang_tokens, alpha=0.5)
    plan = mixture_plan(
        redacted, weights, mix_budget, domain_col="lang"
    )
    mixture = mixture_sample(
        redacted, plan, domain_col="lang"
    ).withColumn(
        "mix_id", F.col("doc_id") * 100 + F.col("epoch")
    ).localCheckpoint()
    stats["mixture_rows"] = mixture.count()
    mix_tok = {
        r["lang"]: r["t"]
        for r in mixture.groupBy("lang")
        .agg(F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t"))
        .collect()
    }
    total_mix = sum(mix_tok.values()) or 1
    stats["mixture_tokens"] = sum(mix_tok.values())
    stats["mixture_share"] = {
        k: round(v / total_mix, 3) for k, v in sorted(mix_tok.items())
    }
    mark("mixture")

    # 6. tokenizer: BPE merges from the surviving corpus (fit on the
    # DEDUPLICATED survivors, not the weighted mixture — repeats would
    # just re-count the same pairs); report the MIXTURE's token budget
    # under that tokenizer
    from gus_spark.operators.bpe import (
        bpe_base_symbols,
        bpe_decode_ids,
        bpe_encode,
        bpe_fertility,
        bpe_fit,
        bpe_vocab,
    )

    merges = bpe_fit(redacted, num_merges=64)
    stats["bpe_merges"] = len(merges)
    stats["bpe_tokens_total"] = (
        bpe_encode(
            mixture.select(F.col("mix_id").alias("doc_id"), "text"),
            merges,
        ).agg(F.sum("n_tokens")).first()[0]
    )
    # tokenizer health per language (r11): fertility near word level
    # and zero unks say the fit covers every surviving language —
    # a language encoding near character level here would be the
    # cheapest possible warning before a training run pays for it.
    # byte_fallback (r12): ids 1..256 reserve the UTF-8 byte alphabet
    # so the shipped tokenizer is TOTAL — a late-arriving document in
    # an unseen script still encodes (and round-trips), with unk_rate
    # reading as fallback rate
    vocab = bpe_vocab(
        merges, bpe_base_symbols(redacted), byte_fallback=True
    )
    stats["tokenizer_fertility"] = {
        # NULL-safe: a group of whitespace-only survivors aggregates
        # 0 words / 0 tokens -> NULL ratios; report the degenerate
        # group rather than crashing the stats step on round(None)
        r[0]: {
            "fertility": (
                round(r["fertility"], 3)
                if r["fertility"] is not None else None
            ),
            "unk_rate": (
                round(r["unk_rate"], 6)
                if r["unk_rate"] is not None else None
            ),
        }
        for r in bpe_fertility(redacted, merges, vocab).collect()
    }
    mark("bpe")

    # 7. chunk + pack (over the mixture: epoch passes pack as distinct
    # documents via the surrogate id)
    chunks = chunk_documents(
        mixture.select(F.col("mix_id").alias("doc_id"), "text"),
        max_tokens=chunk_tokens,
        overlap=chunk_overlap,
    )
    packed = pack_sequences(
        chunks, budget=seq_budget, shards=pack_shards
    ).localCheckpoint()
    stats["chunks"] = packed.count()
    seqs = packed.select("shard", "seq_id", "seq_tokens").distinct()
    stats["sequences"] = seqs.count()
    fill = seqs.agg(
        (F.sum("seq_tokens") / (F.count("*") * seq_budget)).alias("f")
    ).first()["f"]
    stats["mean_fill"] = round(float(fill), 4) if fill is not None else None

    packed.write.mode("overwrite").parquet(
        os.path.join(out_dir, "packed_sequences")
    )
    mark("chunk_pack")

    # 8. the loader boundary (late r10; token ids r11): assemble each
    # packed sequence into one training example, ENCODE it to token-id
    # arrays under the stage-6 tokenizer, and materialize the split +
    # seeded global order as pos-ordered shard files with a resume
    # cursor — the pipeline now ends at genuine trainer input: the
    # loader's batches carry array<int> tensors, not text. (pack's own
    # shard/seq columns are packing-internal; the writer derives
    # loader shards from the sequence uid.)
    from gus_spark.operators.splits import (
        iter_training_order,
        write_training_shards,
    )

    from gus_spark.operators.chunk import assemble_token_sequences

    # vocab fit in stage 6 over the FIT corpus; the mixture's text is
    # drawn from it, so encoding must produce zero unks — the n_unk
    # sum makes that loud in the stats rather than assumed
    seqs = assemble_token_sequences(
        packed, merges, vocab, include_text=True
    ).localCheckpoint()
    stats["loader_vocab"] = len(vocab)
    stats["loader_unk_tokens"] = int(
        seqs.agg(F.sum("n_unk")).first()[0] or 0
    )
    mark("loader_encode")

    # curriculum (r13): each sequence's quality = mean of its
    # constituent documents' distilled scores (stage 4's classifier),
    # and the shard writer ranks pos by it — epoch 0 reads each shard
    # best-first, epochs > 0 reshuffle as always
    # packed's doc_id is the mixture SURROGATE (mix_id = doc_id*100
    # + epoch), so the classifier scores must be joined through the
    # inverse map — joining on the raw column silently nulls every
    # quality (the all-null frame still satisfies a naive
    # monotonicity check, which is why the receipt below also
    # asserts non-null coverage)
    seq_q = (
        packed.withColumn(
            "orig_doc_id", F.floor(F.col("doc_id") / 100)
        )
        .join(
            scored.select(
                F.col("doc_id").alias("orig_doc_id"), "quality_prob"
            ),
            "orig_doc_id",
            "left",
        )
        .groupBy("shard", "seq_id")
        .agg(F.avg("quality_prob").alias("seq_quality"))
        .select(
            (
                F.shiftleft(F.col("shard").cast("long"), 40)
                + F.col("seq_id").cast("long")
            ).alias("seq_uid"),
            "seq_quality",
        )
    )
    shards_dir = os.path.join(out_dir, "train_shards")
    manifest = write_training_shards(
        seqs.drop("text").join(seq_q, "seq_uid", "left"),
        shards_dir,
        shards=pack_shards,
        id_col="seq_uid",
        order_col="seq_quality",
        order_desc=True,
    )
    # persist the tokenizer NEXT TO the manifest (r12): shards +
    # tokenizer.json are the complete reproducible training input —
    # no live Spark fit needed to interpret the tensors. The decode
    # receipt below deliberately uses the RELOADED artifact.
    from gus_spark.operators.bpe import load_tokenizer, save_tokenizer

    stats["tokenizer_artifact"] = save_tokenizer(
        shards_dir, merges, vocab
    )
    merges_r, vocab_r = load_tokenizer(shards_dir)
    assert (merges_r, vocab_r) == (merges, vocab)
    stats["loader_rows"] = manifest["total_rows"]
    stats["loader_split_rows"] = {
        split: sum(counts.values())
        for split, counts in sorted(manifest["shard_rows"].items())
    }
    # trainer-input receipt on the first training-order batch: the
    # token ids decode back to the packed text (whitespace-normalized
    # — BPE's contract) AND the doc spans tile the sequence exactly
    # (1-based, gap-free) — the mask metadata a trainer consumes
    import re as _re

    batch, _cur = next(
        iter_training_order(shards_dir, "train", batch_rows=1)
    )
    row = batch.to_pylist()[0]
    packed_text = seqs.filter(
        F.col("seq_uid") == row["seq_uid"]
    ).first()["text"]
    want = " ".join(
        w for w in _re.split(r"\s+", packed_text, flags=_re.ASCII) if w
    )
    assert bpe_decode_ids(row["token_ids"], vocab_r) == want, (
        "loader round-trip broke: decode(token_ids) != packed text"
    )
    off = 1
    for s in sorted(row["doc_spans"], key=lambda s: s["start"]):
        assert s["start"] == off and s["len"] > 0, row["doc_spans"]
        off += s["len"]
    assert off - 1 == len(row["token_ids"])
    stats["loader_roundtrip_ok"] = True
    # curriculum receipt: epoch-0 pos order within each shard is
    # quality non-increasing (nulls last — desc_nulls_last)
    per_shard: dict[int, list] = {}
    for b, cur in iter_training_order(shards_dir, "train"):
        per_shard.setdefault(cur[0], []).extend(
            b.column("seq_quality").to_pylist()
        )
    def _mono(vals):
        prev, seen_null = None, False
        for v in vals:
            if v is None:
                seen_null = True
                continue
            if seen_null or (prev is not None and v > prev + 1e-12):
                return False
            prev = v
        return True
    qual_vals = [
        v for vals in per_shard.values() for v in vals
        if v is not None
    ]
    stats["curriculum_scored_seqs"] = len(qual_vals)
    # non-vacuous: an all-null quality column (e.g. a broken join)
    # would satisfy _mono trivially — require real scores AND order
    assert qual_vals, "no sequence carried a quality score"
    stats["curriculum_monotone"] = all(
        _mono(v) for v in per_shard.values()
    )
    assert stats["curriculum_monotone"]
    mark("loader_shards")

    # 9. late-benchmark doc-span masking (r13): a benchmark landing
    # AFTER the shards were materialized decontaminates them with
    # minimal retention loss — the contaminated docs' exact doc_spans
    # become loss masks; every packed neighbor keeps training. The
    # stats contrast what whole-sequence removal would have cost
    # (SCALING.md §masking: ~(k−1)·p collateral at k docs/sequence).
    from gus_spark.operators.splits import mask_training_sequences

    late_ids = [
        r["doc_id"]
        for r in packed.select("doc_id").distinct().limit(5).collect()
    ]
    receipt = mask_training_sequences(
        spark,
        shards_dir,
        spark.createDataFrame([(i,) for i in late_ids], "doc_id long"),
    )
    total_tok = 0
    masked_tok = 0
    whole_seq_tok = 0
    for b, _c in iter_training_order(shards_dir, "train"):
        for r in b.to_pylist():
            total_tok += r["n_tokens"]
            if r["masked_spans"] is not None:
                masked_tok += sum(s["len"] for s in r["masked_spans"])
                whole_seq_tok += r["n_tokens"]
    stats["mask_late_docs"] = len(late_ids)
    stats["mask_sequences"] = receipt["masked_sequences"]
    stats["mask_tokens_frac"] = (
        round(masked_tok / total_tok, 4) if total_tok else None
    )
    stats["mask_whole_seq_frac"] = (
        round(whole_seq_tok / total_tok, 4) if total_tok else None
    )
    mark("mask_late_bench")

    # 10. mixture read (r13): the trainer draws from TWO components —
    # the full shard set plus a small high-quality replay set (the
    # top decile by the stage-4 distilled quality, upweighted past
    # its size share) — via iter_mixture's pure-(seed, step)
    # schedule. The receipt is the published-mixture regime itself:
    # the small component's epoch counter outruns the base's (GPT-3's
    # >1-epoch books/wiki move), realized draw proportions track the
    # weights, and the base set's masked_spans ride every mixture
    # batch unchanged.
    from gus_spark.operators.splits import iter_mixture

    train_df = seqs.drop("text").join(seq_q, "seq_uid", "left")
    q90 = train_df.agg(
        F.expr("percentile(seq_quality, 0.9)")
    ).first()[0]
    hq_dir = os.path.join(out_dir, "hq_replay_shards")
    # shards >= the largest fleet the set will serve: a component's
    # per-rank slice of its shard dirs must never be empty (stage 11
    # rescales to 3 ranks; 2 shards would leave rank 2 with nothing
    # to serve and the loader correctly refuses)
    hq_manifest = write_training_shards(
        train_df.filter(F.col("seq_quality") >= q90),
        hq_dir,
        shards=4,
        id_col="seq_uid",
        weights={"train": 1.0},
        order_col="seq_quality",
        order_desc=True,
    )
    # the replay set is derived from the same packed tier, so the
    # stage-9 benchmark contamination applies to it too — mask it
    # under the SAME doc ids (idempotent; only sequences containing
    # them gain spans). Skipping this would serve the contaminated
    # spans unmasked through the replay component.
    mask_training_sequences(
        spark,
        hq_dir,
        spark.createDataFrame([(i,) for i in late_ids], "doc_id long"),
    )
    # one replay pass ≈ several hq epochs at ANY corpus size: size
    # the leg from the hq manifest instead of constants (at 30% of
    # draws × batch_rows rows each, steps covers the hq set ~3×)
    hq_rows = hq_manifest["total_rows"]
    mix_batch = max(8, hq_rows // 8)
    mix_steps = max(40, int(3 * hq_rows / (0.3 * mix_batch)) + 1)
    draws = {"base": 0, "hq_replay": 0}
    mix_masked = 0
    last_cur = None
    for name, b, last_cur in iter_mixture(
        {"base": (shards_dir, 0.7), "hq_replay": (hq_dir, 0.3)},
        "train",
        batch_rows=mix_batch,
        max_steps=mix_steps,
    ):
        draws[name] += 1
        if "masked_spans" in b.schema.names:
            mix_masked += b.num_rows - b.column(
                "masked_spans"
            ).null_count
    epochs = {
        n: s["epoch"] for n, s in last_cur["states"].items()
    }
    stats["mixture_draws"] = draws
    stats["mixture_epochs"] = epochs
    stats["mixture_masked_rows"] = mix_masked
    assert epochs["hq_replay"] > epochs["base"], epochs
    assert mix_masked > 0  # stage-9 masks ride the mixture batches
    mark("mixture_read")

    # 11. trainer fleet rescale (r13): a 2-rank mixture fleet reads
    # part of the epoch, rescales to 3 ranks mid-epoch via
    # migrate_mixture_cursors, and the new fleet reads on under the
    # consumed bundle — the receipt is exactly-once ACROSS the
    # rescale: within each component's rescale epoch, no sequence
    # is delivered twice and nothing is lost relative to the
    # component's epoch row set.
    from gus_spark.operators.splits import migrate_mixture_cursors

    mix_spec = {
        "base": (shards_dir, 0.7), "hq_replay": (hq_dir, 0.3),
    }
    fleet_seen: dict[str, dict[int, set]] = {}

    def _note(name, cur, b):
        e = cur["states"][name]["epoch"]
        fleet_seen.setdefault(name, {}).setdefault(e, set()).update(
            b.column("seq_uid").to_pylist()
        )

    old_curs = []
    for r in range(2):
        c = None
        for name, b, c in iter_mixture(
            mix_spec, "train", rank=r, world_size=2,
            batch_rows=mix_batch, max_steps=3,
        ):
            _note(name, c, b)
        old_curs.append(c)
    new_curs, bundle = migrate_mixture_cursors(old_curs, mix_spec, 3)
    for r in range(3):
        for name, b, c in iter_mixture(
            mix_spec, "train", rank=r, world_size=3,
            cursor=new_curs[r], consumed=bundle,
            batch_rows=mix_batch, max_steps=8,
        ):
            # duplicates within the same (component, epoch) would be
            # a rescale bug — count before merging
            e = c["states"][name]["epoch"]
            ids = set(b.column("seq_uid").to_pylist())
            prior = fleet_seen.setdefault(name, {}).setdefault(
                e, set()
            )
            assert not (prior & ids), "rescale re-delivered rows"
            prior.update(ids)
    stats["rescale_epoch_rows"] = {
        n: {e: len(s) for e, s in sorted(per.items())}
        for n, per in sorted(fleet_seen.items())
    }
    mark("fleet_rescale")
    stats["stage_secs"] = stage_secs
    stats["total_secs"] = round(sum(stage_secs.values()), 3)
    return stats


def main() -> None:
    from gus_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"
    )
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gus_pipeline_out"
    spark = get_spark(app_name="gus_spark-pipeline-demo")
    print(json.dumps(run_pipeline(spark, sf_dir, out_dir)))


if __name__ == "__main__":
    main()
