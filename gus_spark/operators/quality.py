"""Model-based document quality scoring (classifier distillation).

The pattern behind FineWeb-Edu / DCLM / the GPT-3 quality filter: cheap
heuristic gates label a seed set, a lightweight classifier distills
those labels, and the CLASSIFIER then scores the full corpus — it
generalizes past the heuristics' hard edges and yields a continuous
quality probability instead of a binary gate.

Built on Spark MLlib (all JVM-side):

    RegexTokenizer → HashingTF (hashed bag-of-words, no vocabulary to
    build or ship) → IDF → LogisticRegression

- `heuristic_quality_label` is the default weak labeler — the same
  length / chars-per-word / stopword / repetition signals the curation
  and repetition gates use, expressed as one column.
- `fit_quality_classifier` fits the pipeline on any labeled frame
  (weak labels by default; hand labels whenever available).
- `score_quality` adds `quality_prob` (P(label=1)) to a corpus.

Scale shape: HashingTF is stateless per-row hashing (no vocab fit);
IDF and LR training are `treeAggregate` passes over the feature
vectors — O(iterations) scans, coefficients driver-held; scoring is a
pure map. The 2^18 hashed feature space keeps the coefficient vector
at ~2 MB — broadcastable at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from gus_spark.functions.tokenize import tokenize

NUM_FEATURES = 1 << 18


def heuristic_quality_label(
    text: Column,
    min_tokens: int = 10,
    max_chars_per_word: float = 12.0,
    min_stopword_ratio: float = 0.01,
    max_dup_token_frac: float = 0.7,
) -> Column:
    """Weak 0/1 quality label from the standard cheap signals (the
    curation-gate family): enough tokens, plausible word lengths, some
    stopword mass, not dominated by repeated tokens."""
    # filter the empty-string split artifacts ('\n'-padded text —
    # Spark trim() strips only ASCII spaces), or every ratio's
    # denominator is inflated by phantom tokens right at the gate
    # thresholds the distilled classifier learns from
    toks = tokenize(text, "words")
    n = F.size(toks)
    chars_per_word = F.length(text).cast("double") / n
    stop_hits = (
        F.size(F.filter(toks, lambda w: w.isin("the", "a", "of", "and")))
    )
    dup_frac = (n - F.size(F.array_distinct(toks))).cast("double") / n
    good = (
        (n >= min_tokens)
        & (chars_per_word <= max_chars_per_word)
        & (stop_hits.cast("double") / n >= min_stopword_ratio)
        & (dup_frac <= max_dup_token_frac)
    )
    return F.when(good, F.lit(1.0)).otherwise(F.lit(0.0))


def fit_quality_classifier(
    df: DataFrame,
    text_col: str = "text",
    label_col: str | None = None,
    num_features: int = NUM_FEATURES,
    max_iter: int = 30,
    reg_param: float = 1e-3,
):
    """Fit the tokenize→hash→idf→LR pipeline; returns a PipelineModel
    (`.save(path)` / `PipelineModel.load(path)` for persistence).
    With ``label_col=None`` the heuristic weak label supervises —
    pure distillation, no hand labels needed."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import IDF, HashingTF, RegexTokenizer

    live = df.filter(F.col(text_col).isNotNull())
    if label_col is None:
        label_col = "_weak_label"
        live = live.withColumn(
            label_col, heuristic_quality_label(F.col(text_col))
        )
    pipeline = Pipeline(
        stages=[
            RegexTokenizer(
                inputCol=text_col,
                outputCol="_q_words",
                pattern=r"\s+",
                toLowercase=True,
            ),
            HashingTF(
                inputCol="_q_words",
                outputCol="_q_tf",
                numFeatures=num_features,
            ),
            IDF(inputCol="_q_tf", outputCol="_q_features"),
            LogisticRegression(
                featuresCol="_q_features",
                labelCol=label_col,
                maxIter=max_iter,
                regParam=reg_param,
            ),
        ]
    )
    return pipeline.fit(live)


def score_quality(
    df: DataFrame, model, text_col: str = "text"
) -> DataFrame:
    """Input columns + ``quality_prob`` = P(good) per document (null
    text scores are excluded like every text operator)."""
    from pyspark.ml.functions import vector_to_array

    live = df.filter(F.col(text_col).isNotNull())
    scored = model.transform(live)
    keep = [c for c in df.columns]
    return scored.select(
        *keep,
        F.element_at(vector_to_array("probability"), 2).alias(
            "quality_prob"
        ),
    )
