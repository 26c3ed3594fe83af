"""PII redaction over text columns.

Training-data pipelines scrub personally identifiable information
before a corpus ships; the standard first tier is pattern-based span
replacement (emails, phone numbers, IP addresses, national-ID /
card-number shapes) — cf. the public C4 / Dolma / FineWeb cleaning
recipes. This module implements that tier as pure JVM column
expressions: an ordered chain of `regexp_replace` calls, one per
pattern class, each replacing every occurrence with a typed
placeholder token.

Scale shape: a per-row regex map — zero shuffles, whole-stage codegen,
embarrassingly parallel; at 100 TB it scales out with executors
exactly like the text_profile family. No Python in the plan.

Cross-engine regex discipline: every pattern sticks to the syntax
subset with IDENTICAL semantics in Java `java.util.regex` (Spark),
RE2 (the DuckDB oracle) and Python `re` (tests): explicit ASCII
classes (`[0-9]`, never `\\d` with unicode ambiguity), `(?:...)`
non-capture groups, bounded repetition, ASCII `\\b` word boundaries.
No lookaround, no backreferences (RE2 has neither). DuckDB's
`regexp_replace` replaces only the FIRST match unless passed the
``'g'`` flag — `sql_redact` emits it; Spark always replaces all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: (name, pattern, placeholder) — applied IN ORDER; order matters only
#: across classes whose matches could nest (none of the current five
#: overlap, but e.g. an IP never survives inside an already-redacted
#: email because email runs first).
PII_PATTERNS: list[tuple[str, str, str]] = [
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "<EMAIL>",
    ),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("card", r"\b(?:[0-9]{4}[- ]){3}[0-9]{4}\b", "<CARD>"),
    ("ip", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9]{7,15}\b", "<PHONE>"),
]


def redact_text(col: Column) -> Column:
    """Chain of all-class replacements over one text column."""
    out = col
    for _, pattern, token in PII_PATTERNS:
        out = F.regexp_replace(out, F.lit(pattern), F.lit(token))
    return out


def sql_redact(expr: str) -> str:
    """The DuckDB twin of `redact_text` — same patterns, same order,
    with the 'g' flag (DuckDB defaults to first-match-only)."""
    out = expr
    for _, pattern, token in PII_PATTERNS:
        quoted = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{quoted}', '{token}', 'g')"
    return out


def hit_count(redacted: Column, token: str) -> Column:
    """Occurrences of a placeholder token in redacted text (the
    length-difference idiom shared with queries/text.py — exact and
    engine-portable, placeholders contain no regex metachars)."""
    return (
        (
            F.length(redacted)
            - F.length(F.regexp_replace(redacted, F.lit(token), F.lit("")))
        )
        / F.lit(len(token))
    ).cast("long")


def sql_hit_count(expr: str, token: str) -> str:
    return (
        f"CAST((LENGTH({expr}) - LENGTH(REPLACE({expr}, '{token}', '')))"
        f" / {len(token)} AS BIGINT)"
    )


def redact_pii(
    df: DataFrame, text_col: str = "text", with_counts: bool = True
) -> DataFrame:
    """Replace ``text_col`` with its redacted form; with_counts adds a
    ``n_<class>`` hit-count column per pattern class (how many spans
    were scrubbed — the per-doc audit signal curation reports need)."""
    out = df.withColumn(text_col, redact_text(F.col(text_col)))
    if with_counts:
        for name, _, token in PII_PATTERNS:
            out = out.withColumn(
                f"n_{name}", hit_count(F.col(text_col), token)
            )
    return out
