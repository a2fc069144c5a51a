"""Metric tests: AUC/MRR/nDCG against sklearn (when present) and hand values."""

import numpy as np
import pytest

from pytorch_news_recommender_tpu.train import metrics as M


def test_auc_simple():
    y = np.array([1, 0, 0, 0])
    s = np.array([0.9, 0.1, 0.2, 0.3])
    assert M.auc_score(y, s) == 1.0
    s2 = np.array([0.0, 0.5, 0.5, 0.5])
    assert M.auc_score(y, s2) == 0.0


def test_auc_ties_average():
    y = np.array([1, 0])
    s = np.array([0.5, 0.5])
    assert M.auc_score(y, s) == 0.5


def test_auc_matches_sklearn():
    sklearn = pytest.importorskip("sklearn.metrics")
    rng = np.random.default_rng(0)
    for _ in range(20):
        n = int(rng.integers(4, 60))
        y = rng.integers(0, 2, size=n)
        if y.sum() in (0, n):
            y[0] = 1 - y[0]
        s = np.round(rng.normal(size=n), 1)  # ties likely
        np.testing.assert_allclose(
            M.auc_score(y, s), sklearn.roc_auc_score(y, s), rtol=1e-12)


def test_mrr():
    y = np.array([0, 1, 0, 1])
    s = np.array([0.9, 0.8, 0.7, 0.6])
    # positives at ranks 2 and 4 -> (1/2 + 1/4) / 2
    assert abs(M.mrr_score(y, s) - (0.5 + 0.25) / 2) < 1e-12


def test_ndcg_perfect_ranking_is_one():
    y = np.array([1, 0, 1, 0, 0])
    s = np.array([5.0, 1.0, 4.0, 0.5, 0.2])
    assert abs(M.ndcg_score(y, s, 5) - 1.0) < 1e-12


def test_aggregate_skips_single_class():
    labels = [np.array([1, 0]), np.array([0, 0])]
    scores = [np.array([1.0, 0.0]), np.array([0.3, 0.1])]
    out = M.aggregate_metrics(labels, scores)
    assert out["auc"] == 1.0  # second impression contributes NaN, skipped
