"""N-gram language-model perplexity scoring (the CCNet quality
signal: Wenzek et al. 2020, arXiv 1911.00359, score corpus documents
by LM perplexity; smoothing is Stupid Backoff — Brants et al. 2007,
"Large Language Models in Machine Translation" — the scheme DESIGNED
for distributed MapReduce LMs: no discounting state, only raw counts).

    S(w | ctx_m) = count(m-gram) / count((m-1)-gram context)   if seen
                 = alpha * S(w | ctx_{m-1})                    else
    S(w)         = count(w) / total_tokens                (unigram base)
    OOV          = alpha^backoffs / (total_tokens + 1)

    doc score: log10_ppl = -(Σ log10 S(w_i | ctx)) / n_tokens
    (lower = more like the LM's training corpus — CCNet keeps the
    low-perplexity head/middle of the distribution).

Spark-first shape:

- FIT is pure counting: one gram-occurrence pass (numpy Arrow kernel
  reusing the substring family's rolling-polynomial window hashes —
  ≤ `order` rows per token) into ONE groupBy on (order, gram hash) —
  uniform 64-bit keys, map-side partial counts. The model IS a
  DataFrame; persist it like any table.
- SCORING joins each document's gram occurrences (same kernel)
  against the count table on (order, hash) — the decontaminate
  equi-join shape — then ONE groupBy per doc feeds an Arrow kernel
  that walks the backoff chain per position from the joined counts
  (the (m−1)-gram context count the chain needs is the occurrence
  row at (pos−1, m−1), already in the group). State per task is one
  document's ≤ order·n count rows.
- The only driver-side values are total_tokens and the vocabulary
  size (one 1-row aggregate each — the bounded-scalar class).

Counts are keyed by 64-bit polynomial hashes (collision ~2⁻⁶⁴/pair,
the substring family's bound); scoring is float64 with a fixed
evaluation order per position (sequential backoff walk), so scores
are deterministic across partitionings — asserted against a
pure-Python reference in tests/test_lm.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gus_spark.operators.substring import _tokens_and_hashes, _window_hashes
from gus_spark.operators.util import ensure_parallelism

ALPHA = 0.4  # Brants et al.'s backoff constant


def _occurrences(base: DataFrame, order: int) -> DataFrame:
    """(doc, pos, m, gh): for every token position, the m-gram ENDING
    there for m = 1..min(order, pos+1)."""
    import pandas as pd

    def kernel(batches):
        import numpy as np

        for pdf in batches:
            dids, poss, ms, ghs = [], [], [], []
            for did, th in zip(pdf["_did"], pdf["_th"]):
                if th is None:  # NULL text -> no grams
                    continue
                n = len(th)
                if n == 0:
                    continue
                for m in range(1, min(order, n) + 1):
                    gh = _window_hashes(th, m)
                    cnt = gh.shape[0]
                    dids.append(np.full(cnt, did, dtype="int64"))
                    # window starting at j has length m -> ends at j+m-1
                    poss.append(
                        np.arange(m - 1, m - 1 + cnt, dtype="int32")
                    )
                    ms.append(np.full(cnt, m, dtype="int32"))
                    ghs.append(gh.view("int64"))
            if not dids:
                yield pd.DataFrame(
                    {"_did": pd.Series([], dtype="int64"),
                     "pos": pd.Series([], dtype="int32"),
                     "m": pd.Series([], dtype="int32"),
                     "gh": pd.Series([], dtype="int64")}
                )
                continue
            yield pd.DataFrame(
                {
                    "_did": np.concatenate(dids),
                    "pos": np.concatenate(poss),
                    "m": np.concatenate(ms),
                    "gh": np.concatenate(ghs),
                }
            )

    return base.select("_did", "_th").mapInPandas(
        kernel, "_did long, pos int, m int, gh long"
    )


def fit_ngram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 3,
) -> DataFrame:
    """The count table (m, gh, c) for m = 1..order — the whole model.
    Persist with plain parquet; total tokens = SUM(c) WHERE m = 1."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    base = _tokens_and_hashes(
        ensure_parallelism(df.filter(F.col(text_col).isNotNull())),
        id_col,
        text_col,
    )
    return (
        _occurrences(base, order)
        .groupBy("m", "gh")
        .agg(F.count("*").alias("c"))
    )


def perplexity_score(
    df: DataFrame,
    lm: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 3,
    alpha: float = ALPHA,
) -> DataFrame:
    """(id, n_tokens, log10_ppl) per non-null document. Documents with
    zero tokens score NULL. Lower = closer to the LM's corpus."""
    if order < 1:
        raise ValueError(f"order must be >= 1, got {order}")
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    import pandas as pd

    spark = df.sparkSession
    total = lm.filter(F.col("m") == 1).agg(F.sum("c")).first()[0] or 0
    if total == 0:
        raise ValueError("empty language model (no unigram counts)")

    base = _tokens_and_hashes(
        ensure_parallelism(df.filter(F.col(text_col).isNotNull())),
        id_col,
        text_col,
    )
    occ = _occurrences(base, order)
    counted = occ.join(lm, ["m", "gh"], "left").select(
        "_did", "pos", "m", F.col("c")
    )

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        did = int(pdf["_did"].iloc[0])
        counts = {}
        n_tokens = 0
        for pos, m, c in zip(pdf["pos"], pdf["m"], pdf["c"]):
            if m == 1:
                n_tokens = max(n_tokens, int(pos) + 1)
            if not pd.isna(c):
                counts[(int(pos), int(m))] = int(c)
        log_sum = 0.0
        for i in range(n_tokens):
            penalty = 1.0
            s = None
            for m in range(min(order, i + 1), 0, -1):
                num = counts.get((i, m))
                if num is None:
                    penalty *= alpha
                    continue
                if m == 1:
                    s = penalty * num / total
                    break
                den = counts.get((i - 1, m - 1))
                if den is None:
                    # numerator seen but its context unseen can only
                    # happen under a foreign LM; back off the same way
                    penalty *= alpha
                    continue
                s = penalty * num / den
                break
            if s is None:  # OOV even at unigram level
                s = penalty * (1.0 / (total + 1))
            log_sum += math.log10(s)
        return pd.DataFrame(
            {
                "_did": [did],
                "n_tokens": pd.Series([n_tokens], dtype="int64"),
                "log10_ppl": [
                    -log_sum / n_tokens if n_tokens else None
                ],
            }
        )

    scored = counted.groupBy("_did").applyInPandas(
        _score, "_did long, n_tokens long, log10_ppl double"
    )
    # zero-token documents never produce occurrence rows: re-attach
    live = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("_did")
    )
    return (
        live.join(scored, "_did", "left")
        .select(
            F.col("_did").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            "log10_ppl",
        )
    )


#: CCNet's split: ascending-perplexity thirds per language
CCNET_CUTS: tuple[tuple[int, int], ...] = ((1, 3), (2, 3))
CCNET_LABELS: tuple[str, ...] = ("head", "middle", "tail")


def _check_cut_spec(cuts, labels) -> None:
    if len(labels) != len(cuts) + 1:
        raise ValueError(
            f"need exactly len(cuts)+1 labels, got {len(cuts)} cuts "
            f"and {len(labels)} labels"
        )
    fracs = []
    for num, den in cuts:
        if not (
            isinstance(num, int) and isinstance(den, int)
            and 0 < num < den
        ):
            raise ValueError(
                f"each cut must be integers (num, den) with "
                f"0 < num < den, got {(num, den)!r}"
            )
        fracs.append(num / den)
    if fracs != sorted(set(fracs)):
        raise ValueError(f"cuts must be strictly ascending, got {cuts!r}")


def perplexity_buckets(
    scored: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "log10_ppl",
    id_col: str = "doc_id",
    cuts: tuple[tuple[int, int], ...] = CCNET_CUTS,
    labels: tuple[str, ...] = CCNET_LABELS,
    tier: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """CCNet's head/middle/tail assignment (Wenzek et al. 2020 §4.4:
    per language, order documents by LM perplexity ascending and cut
    the distribution into thirds; 'head' is what high-quality-regime
    training keeps). Input is a scored frame (``perplexity_score``
    output joined back to its language column); output adds
    ``bucket``. NULL-perplexity rows (zero-token docs) get a NULL
    bucket — they have no place in the distribution.

    ``cuts`` are exact rationals (num, den), not floats: row with
    1-based rank r of n is in bucket i iff r·den_i <= n·num_i and no
    earlier cut admits it — pure integer comparisons, so the DuckDB
    twin (`sql_perplexity_buckets`) matches bit-for-bit including
    every boundary row. Ties in perplexity break by id (total order).

    Tiers (the repo's exact/scale pattern):

    - ``'exact'``: rank + count over one ``lang``-keyed window — ONE
      exchange, the oracle tier. Per-language sort: fine when no
      single language dwarfs a task's memory, but at web scale one
      language IS most of the corpus, so the sort (and its skew) is
      the cost.
    - ``'approx'``: per-language cut THRESHOLDS from
      ``percentile_approx`` (one aggregation, map-side partials, one
      row per language), broadcast back, assignment is a pure map —
      NO sort at any scale, the CCNet-at-scale shape. Disagreement
      with exact is rank-bounded by the sketch (error <= n/accuracy
      ranks, adjacent buckets only, thresholds are monotone) — EXCEPT
      at a point mass: equal values are indistinguishable to a
      threshold rule, so a value straddling a cut moves as a block
      where the exact tier splits it by the id tie-break. On
      real-valued perplexities mass ties are measure-zero; a heavily
      quantized score column is the caller's signal to prefer the
      exact tier.
    """
    _check_cut_spec(cuts, labels)
    live = scored.filter(F.col(ppl_col).isNotNull())
    dead = scored.filter(F.col(ppl_col).isNull()).withColumn(
        "bucket", F.lit(None).cast("string")
    )
    if tier == "exact":
        from pyspark.sql import Window

        w = Window.partitionBy(lang_col)
        ranked = live.withColumn(
            "_rnk",
            # long: r*den must survive languages past 2^31/den rows —
            # exactly the one-dominant-language regime the tier note
            # warns about (row_number itself is 32-bit)
            F.row_number().over(w.orderBy(ppl_col, id_col)).cast("long"),
        ).withColumn("_n", F.count("*").over(w))
        expr = F.lit(labels[-1])
        for (num, den), label in reversed(
            list(zip(cuts, labels[:-1]))
        ):
            expr = F.when(
                F.col("_rnk") * den <= F.col("_n") * num, label
            ).otherwise(expr)
        bucketed = ranked.withColumn("bucket", expr).drop("_rnk", "_n")
    elif tier == "approx":
        thresholds = perplexity_thresholds(
            live, lang_col, ppl_col, cuts, accuracy
        )
        return assign_buckets(
            scored, thresholds, lang_col, ppl_col, labels
        )
    else:
        raise ValueError(f"unknown tier {tier!r}")
    return bucketed.unionByName(
        dead.select(*bucketed.columns)
    )


def perplexity_thresholds(
    scored: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "log10_ppl",
    cuts: tuple[tuple[int, int], ...] = CCNET_CUTS,
    accuracy: int = 10_000,
) -> DataFrame:
    """The approx tier's per-language cut thresholds as a standalone
    (lang, _cuts array) frame — one ``percentile_approx`` aggregation,
    one output row per language. Split out (late r10) because this IS
    the frozen artifact CCNet-style serving wants: fit thresholds
    once on a reference corpus, persist the handful of rows like any
    table, and label everything that arrives later — including a
    STREAM: ``assign_buckets`` is a pure broadcast map with no window
    and no state, safe inside any foreachBatch stage (asserted in
    test_lm.py). Recomputing thresholds per micro-batch would make
    bucket boundaries drift with batch composition; freezing them is
    the semantic CCNet actually has (its LM and cutoffs are fit
    offline)."""
    return scored.filter(F.col(ppl_col).isNotNull()).groupBy(
        lang_col
    ).agg(
        F.percentile_approx(
            ppl_col, [num / den for num, den in cuts], accuracy
        ).alias("_cuts")
    )


def assign_buckets(
    scored: DataFrame,
    thresholds: DataFrame,
    lang_col: str = "lang",
    ppl_col: str = "log10_ppl",
    labels: tuple[str, ...] = CCNET_LABELS,
) -> DataFrame:
    """Label ``scored`` against FROZEN per-language thresholds
    (`perplexity_thresholds` output, broadcast): a pure map — no
    sort, no window, no state at any scale. NULL scores get a NULL
    bucket; a language absent from the thresholds labels NULL too
    (scored-after-fit languages have no defined distribution — a
    loud-by-NULL outcome rather than a silent guess). The artifact's
    one-row-per-language invariant is checked loudly up front
    (language-cardinality-bounded — a duplicated refit appended next
    to the old artifact would otherwise silently multiply every
    scored row through the join with conflicting cuts; r11, the
    shared checked_artifact contract with the cap applier)."""
    from gus_spark.operators.util import checked_artifact

    thresholds = checked_artifact(
        thresholds.select(lang_col, "_cuts"),
        lang_col,
        "perplexity thresholds artifact",
    )
    live = scored.filter(F.col(ppl_col).isNotNull())
    dead = scored.filter(F.col(ppl_col).isNull()).withColumn(
        "bucket", F.lit(None).cast("string")
    )
    # null-safe: a NULL language is a legitimate group (the exact
    # tier windows it); a plain equi-join would silently drop it
    joined = live.join(
        F.broadcast(
            thresholds.withColumnRenamed(lang_col, "_tl")
        ),
        F.col(lang_col).eqNullSafe(F.col("_tl")),
        "left",
    ).drop("_tl")
    expr = F.when(
        F.col("_cuts").isNull(), F.lit(None).cast("string")
    ).otherwise(F.lit(labels[-1]))
    for i, label in reversed(list(enumerate(labels[:-1]))):
        expr = F.when(
            F.col(ppl_col) <= F.element_at("_cuts", i + 1), label
        ).otherwise(expr)
    bucketed = joined.withColumn("bucket", expr).drop("_cuts")
    return bucketed.unionByName(dead.select(*bucketed.columns))


def sql_perplexity_buckets(
    table: str,
    lang_col: str = "lang",
    ppl_col: str = "log10_ppl",
    id_col: str = "doc_id",
    cuts: tuple[tuple[int, int], ...] = CCNET_CUTS,
    labels: tuple[str, ...] = CCNET_LABELS,
) -> str:
    """DuckDB twin of the exact tier — identical integer-rational cut
    comparisons over the same (ppl, id) ordering."""
    _check_cut_spec(cuts, labels)
    # the splits.py seed-escape convention: labels land in string
    # literals
    esc = [label.replace("'", "''") for label in labels]
    cases = " ".join(
        f"WHEN _rnk * {den} <= _n * {num} THEN '{label}'"
        for (num, den), label in zip(cuts, esc[:-1])
    )
    return f"""
    SELECT * EXCLUDE (_rnk, _n),
           CASE {cases} ELSE '{esc[-1]}' END AS bucket
    FROM (
      SELECT *,
             ROW_NUMBER() OVER (
               PARTITION BY {lang_col} ORDER BY {ppl_col}, {id_col}
             ) AS _rnk,
             COUNT(*) OVER (PARTITION BY {lang_col}) AS _n
      FROM {table} WHERE {ppl_col} IS NOT NULL)
    UNION ALL BY NAME
    SELECT *, NULL AS bucket FROM {table} WHERE {ppl_col} IS NULL
    """
