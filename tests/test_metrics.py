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


def test_vectorized_aggregate_matches_loop():
    """The grouped/vectorized aggregate_metrics must match the scalar
    per-impression path exactly — ties, degenerate impressions (all-pos /
    all-neg), and sub-k widths included."""
    import numpy as np

    from pytorch_news_recommender_tpu.train import metrics as M

    rng = np.random.default_rng(3)
    labels, scores = [], []
    for i in range(400):
        w = int(rng.integers(2, 35))
        y = (rng.random(w) < 0.25).astype(np.float64)
        s = rng.standard_normal(w).astype(np.float32)
        if i % 7 == 0:
            s[: w // 2] = s[0]          # heavy score ties
        if i % 11 == 0:
            y[:] = 1.0                  # all-positive -> NaN AUC
        if i % 13 == 0:
            y[:] = 0.0                  # all-negative -> NaN everything
        labels.append(y)
        scores.append(s)
    fast = M.aggregate_metrics(labels, scores)
    slow = M.aggregate_metrics_loop(labels, scores, parallel=False)
    for k in ("auc", "mrr", "ndcg@5", "ndcg@10"):
        np.testing.assert_allclose(fast[k], slow[k], rtol=1e-12, atol=1e-12)


def test_ranks_2d_matches_scalar_ranks():
    import numpy as np

    from pytorch_news_recommender_tpu.train import metrics as M

    rng = np.random.default_rng(0)
    s = rng.integers(0, 6, size=(50, 17)).astype(np.float64)  # many ties
    got = M._ranks_2d(s)
    for i in range(len(s)):
        np.testing.assert_array_equal(got[i], M._average_ranks(s[i]))
