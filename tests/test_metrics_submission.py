"""Submission scorer + loss plotting tests."""

import json

import numpy as np

from pytorch_news_recommender_tpu.train import metrics as M
from pytorch_news_recommender_tpu.utils.plotting import plot_loss


def test_score_submission_roundtrip(tmp_path):
    """Writing ranks from known scores and re-scoring the file must
    reproduce the direct metric values (1/rank preserves order)."""
    from pytorch_news_recommender_tpu.train.submit import scores_to_ranks

    rng = np.random.default_rng(0)
    labels_by_key = {}
    lines = []
    labels, scores = [], []
    for key in range(1, 21):
        c = int(rng.integers(4, 12))
        y = (rng.random(c) < 0.3).astype(np.int8)
        if y.sum() == 0:
            y[0] = 1
        s = rng.standard_normal(c)
        labels_by_key[key] = y
        ranks = scores_to_ranks(s)
        lines.append(f"{key} [{','.join(str(int(r)) for r in ranks)}]")
        labels.append(y)
        scores.append(s)
    sub = tmp_path / "submission.txt"
    sub.write_text("\n".join(lines) + "\n")

    direct = M.aggregate_metrics(labels, scores)
    from_file = M.score_submission_file(sub, labels_by_key)
    for k in ("auc", "mrr", "ndcg@5", "ndcg@10"):
        np.testing.assert_allclose(from_file[k], direct[k], rtol=1e-9)


def test_plot_loss(tmp_path):
    j = tmp_path / "metrics.jsonl"
    recs = [{"step": i, "loss": 2.0 / (1 + i)} for i in range(1, 50)]
    recs.append({"step": 50, "auc": 0.66})
    j.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    png = plot_loss(j)
    if png is not None:  # matplotlib present
        assert png.exists() and png.stat().st_size > 0
