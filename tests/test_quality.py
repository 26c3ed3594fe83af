"""Quality-classifier distillation: the MLlib pipeline learns to
separate clean from junk text from WEAK labels only, generalizes to a
holdout, round-trips through save/load, and scores the real corpus."""

import os
import random
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from conftest import SF_DIR_ORACLE

from gus_spark.operators.quality import (
    fit_quality_classifier,
    heuristic_quality_label,
    score_quality,
)
from gus_spark.queries import table


def _synthetic_corpus(n=400, seed=9):
    """Two separable populations: 'clean' English-ish prose with
    stopwords and varied words; 'junk' — repeated tokens, no
    stopwords, or over-long gibberish words."""
    rng = random.Random(seed)
    clean_vocab = (
        "data model query the table a of and value line part "
        "sort merge stream window batch key row scan fast"
    ).split()
    rows = []
    for i in range(n):
        if i % 2 == 0:
            words = [rng.choice(clean_vocab) for _ in range(40)]
            rows.append((i, " ".join(words), 1))
        else:
            kind = i % 6
            if kind == 1:
                w = f"spam{rng.randrange(3)}"
                rows.append((i, " ".join([w] * 40), 0))
            elif kind == 3:
                rows.append(
                    (i, " ".join("x" * 30 for _ in range(15)), 0)
                )
            else:
                rows.append(
                    (i, " ".join(f"z{rng.randrange(9)}q" * 5
                                 for _ in range(12)), 0)
                )
    return rows


def test_distilled_classifier_separates_holdout(spark, tmp_path):
    rows = _synthetic_corpus()
    df = spark.createDataFrame(
        rows, "doc_id long, text string, truth int"
    )
    train = df.filter("doc_id % 5 != 0")
    holdout = df.filter("doc_id % 5 = 0")

    # the weak labeler itself must agree with truth on this corpus
    # (sanity: distillation needs a usable teacher)
    from pyspark.sql import functions as F

    weak = train.withColumn(
        "w", heuristic_quality_label(F.col("text"))
    )
    agree = weak.filter("CAST(w AS INT) = truth").count() / train.count()
    assert agree >= 0.95, agree

    model = fit_quality_classifier(train)  # weak labels only
    scored = score_quality(holdout, model)
    got = {r["doc_id"]: r["quality_prob"] for r in scored.collect()}
    truth = {r["doc_id"]: r["truth"] for r in holdout.collect()}
    acc = sum(
        1 for d, p in got.items() if (p >= 0.5) == (truth[d] == 1)
    ) / len(got)
    assert acc >= 0.9, acc
    # probabilities are probabilities
    assert all(0.0 <= p <= 1.0 for p in got.values())

    # persistence round-trip: identical scores
    from pyspark.ml import PipelineModel

    path = str(tmp_path / "qmodel")
    model.save(path)
    reloaded = PipelineModel.load(path)
    again = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(holdout, reloaded).collect()
    }
    assert got == again


def test_score_quality_on_real_corpus(spark):
    """End-to-end on the documents table: every non-null-text row gets
    a probability, input columns survive."""
    docs = table(spark, SF_DIR_ORACLE, "documents")
    model = fit_quality_classifier(docs.limit(200))
    out = score_quality(docs.limit(100), model)
    rows = out.collect()
    assert len(rows) == 100
    assert set(out.columns) == set(docs.columns) | {"quality_prob"}
    assert all(0.0 <= r["quality_prob"] <= 1.0 for r in rows)


def test_hand_labels_override_weak(spark):
    """label_col routes supervision: with inverted hand labels the
    model must learn the INVERSE concept — proving the weak labeler is
    only the default, not baked in."""
    rows = _synthetic_corpus(n=200, seed=4)
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        rows, "doc_id long, text string, truth int"
    ).withColumn("inv", (1 - F.col("truth")).cast("double"))
    model = fit_quality_classifier(df, label_col="inv")
    scored = {
        r["doc_id"]: r["quality_prob"]
        for r in score_quality(df, model).collect()
    }
    truth = dict((r[0], r[2]) for r in rows)
    acc = sum(
        1 for d, p in scored.items() if (p >= 0.5) == (truth[d] == 0)
    ) / len(scored)
    assert acc >= 0.9, acc
