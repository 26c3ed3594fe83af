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


@register(
    "text_profile",
    oracle=f"""
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
    """,
)
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
    tokens = F.split(F.trim(text), r"\s+")
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


@register(
    "text_lang_fingerprint",
    oracle=f"""
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
    """,
)
def text_lang_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID plus document fingerprinting in one
    scan (merges the former `text_language_id` + `text_fingerprints`
    probes): per-language marker-hit scores, an argmax prediction
    (deterministic tie-break by fixed language order), an exact-content
    hash, and an order-insensitive bag-of-words hash.

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
    tokens = F.array_distinct(F.split(F.trim(text), r"\s+"))
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
