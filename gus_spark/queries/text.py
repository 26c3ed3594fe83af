"""Text-analysis operators over the `documents` table: token counting,
quality scoring, language-ID heuristics, fingerprinting.

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
    "text_token_counts",
    oracle="""
    SELECT doc_id,
           LENGTH(text) AS len_chars,
           CAST(LENGTH(string_split_regex(TRIM(text), '\\s+')) AS BIGINT)
             AS n_tokens,
           CAST(LENGTH(list_distinct(string_split_regex(TRIM(text), '\\s+')))
             AS BIGINT) AS n_unique_tokens
    FROM documents
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization: total and unique token counts per doc."""
    d = table(spark, sf_dir, "documents")
    tokens = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("len_chars"),
        F.size(tokens).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens)).cast("long").alias("n_unique_tokens"),
    )


@register(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(string_split_regex(TRIM(text), '\\s+')) AS BIGINT)
             AS n_words,
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
def text_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality features: word count, chars/word, stopword
    ratio, punctuation ratio — the standard pre-training corpus filters."""
    d = table(spark, sf_dir, "documents")
    text = F.col("text")
    n_words = F.size(F.split(F.trim(text), r"\s+"))
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
        n_words.cast("long").alias("n_words"),
        (F.length(text).cast("double") / n_words).alias("chars_per_word"),
        (stop_hits.cast("double") / n_words).alias("stopword_ratio"),
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
    "text_language_id",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
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
                ELSE 'zh' END AS predicted_lang
    FROM scores
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-marker language ID: per-language marker-hit scores and an
    argmax prediction (deterministic tie-break by fixed language order)."""
    d = table(spark, sf_dir, "documents")
    text = F.col("text")
    scores = d.select(
        "doc_id",
        "lang",
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
    return scores.withColumn("predicted_lang", predicted)


@register(
    "text_fingerprints",
    oracle="""
    SELECT doc_id,
           md5(text) AS exact_fp,
           md5(array_to_string(list_sort(list_distinct(
               string_split_regex(TRIM(text), '\\s+'))), ' ')) AS bow_fp
    FROM documents
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: exact-content hash plus an order-
    insensitive bag-of-words hash (sorted unique tokens)."""
    d = table(spark, sf_dir, "documents")
    tokens = F.array_distinct(F.split(F.trim(F.col("text")), r"\s+"))
    return d.select(
        "doc_id",
        F.md5(F.col("text")).alias("exact_fp"),
        F.md5(F.array_join(F.array_sort(tokens), " ")).alias("bow_fp"),
    )
