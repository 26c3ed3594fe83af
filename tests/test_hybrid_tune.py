"""Fusion-weight tuning (tools/hybrid_tune.py) — the loop that closes
hybrid_grade's dilution measurement into a SETTING.

Contracts pinned here (VERDICT r9 ask #2):
- in the dense-dominant regime (alpha=1.0) the tuned weight STRICTLY
  lifts holdout MRR over unweighted RRF (the textbook dilution is
  recovered; the quoted numbers live in SCALING.md);
- in the mixed regime (alpha=0.3) tuning never loses to unweighted —
  the grid always contains w=1.0, and selection is tune-half-only, so
  a holdout loss would mean the split generalizes badly (it doesn't);
- when the dense tier is dead (alpha=0.1) the tuner falls back to
  w_dense=1.0 — it must NOT invent a weight from noise;
- engine parity in EVERY regime: hybrid_rrf_batch at the chosen
  weight ranks every holdout target exactly where the pure-Python
  fusion the sweep optimized does (the sweep is only trustworthy if
  the engine executes the same fusion).

The task is the seeded hybrid_grade protocol (queries are their own
relevance targets; tune/holdout split by query-id parity), run at
sf0.01 — the corpus whose regime behavior SCALING.md quotes (at
sf0.001 the dead-dense regime happens to tune to w=0.25 instead of
falling back; the contract under test is the sf0.01 catalog corpus).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import pytest
from conftest import SF_DIR_ORACLE

from tools.hybrid_tune import ALPHAS, run_regimes


@pytest.fixture(scope="module")
def regimes(spark):
    return run_regimes(spark, SF_DIR_ORACLE, alphas=ALPHAS)


def test_engine_parity_every_regime(regimes):
    for alpha, r in regimes.items():
        assert r["engine_agrees"], (alpha, r)


def test_dense_dominant_regime_recovers_dilution(regimes):
    r = regimes["1.0"]
    assert r["mrr_holdout_tuned"] > r["mrr_holdout_unweighted"], r
    assert r["w_dense"] > 1.0, r  # dominant tier gets upweighted


def test_mixed_regime_never_loses(regimes):
    r = regimes["0.3"]
    assert r["mrr_holdout_tuned"] >= r["mrr_holdout_unweighted"], r


def test_dead_dense_falls_back_to_unweighted(regimes):
    r = regimes["0.1"]
    assert r["w_dense"] == 1.0, r
    assert r["mrr_holdout_tuned"] == r["mrr_holdout_unweighted"], r
