"""Impression-level ranking metrics in pure numpy.

Matches the reference metric definitions (``MIND_2020/evaluation.py:6-27``):
AUC (sklearn ``roc_auc_score`` semantics, i.e. Mann-Whitney U with tie-rank
averaging), MRR, and exponential-gain nDCG@k. The reference computes only AUC
in practice and comments out the rest (``train_eval.py:263-270``) — here all
four are first-class.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Dict, Sequence

import numpy as np


def _average_ranks(x: np.ndarray) -> np.ndarray:
    """1-based ranks with ties assigned the average rank (scipy ``rankdata``
    'average' method)."""
    order = np.argsort(x, kind="mergesort")
    sx = x[order]
    # Group boundaries among sorted values
    boundary = np.empty(len(x), dtype=bool)
    boundary[0] = True
    boundary[1:] = sx[1:] != sx[:-1]
    group = np.cumsum(boundary) - 1
    counts = np.bincount(group)
    ends = np.cumsum(counts)
    starts = ends - counts
    avg = (starts + ends + 1) / 2.0  # average of 1-based ranks in the group
    ranks = np.empty(len(x), dtype=np.float64)
    ranks[order] = avg[group]
    return ranks


def auc_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """ROC AUC via the rank-sum statistic; requires both classes present."""
    y_true = np.asarray(y_true, dtype=np.float64)
    y_score = np.asarray(y_score, dtype=np.float64)
    n_pos = y_true.sum()
    n_neg = len(y_true) - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    ranks = _average_ranks(y_score)
    return float((ranks[y_true > 0].sum() - n_pos * (n_pos + 1) / 2.0)
                 / (n_pos * n_neg))


def mrr_score(y_true: np.ndarray, y_score: np.ndarray) -> float:
    """Mean reciprocal rank over all positives (``evaluation.py:20-24``)."""
    order = np.argsort(y_score)[::-1]
    y = np.take(np.asarray(y_true, dtype=np.float64), order)
    rr = y / (np.arange(len(y)) + 1)
    denom = y.sum()
    return float(rr.sum() / denom) if denom > 0 else float("nan")


def dcg_score(y_true: np.ndarray, y_score: np.ndarray, k: int = 10) -> float:
    order = np.argsort(y_score)[::-1]
    y = np.take(np.asarray(y_true, dtype=np.float64), order[:k])
    gains = 2 ** y - 1
    discounts = np.log2(np.arange(len(y)) + 2)
    return float((gains / discounts).sum())


def ndcg_score(y_true: np.ndarray, y_score: np.ndarray, k: int = 10) -> float:
    best = dcg_score(y_true, y_true, k)
    if best == 0:
        return float("nan")
    return dcg_score(y_true, y_score, k) / best


def impression_metrics(y_true: np.ndarray, y_score: np.ndarray) -> Dict[str, float]:
    return {
        "auc": auc_score(y_true, y_score),
        "mrr": mrr_score(y_true, y_score),
        "ndcg@5": ndcg_score(y_true, y_score, 5),
        "ndcg@10": ndcg_score(y_true, y_score, 10),
    }


def aggregate_metrics(
    labels: Sequence[np.ndarray],
    scores: Sequence[np.ndarray],
    parallel: bool | None = None,
) -> Dict[str, float]:
    """Mean per-impression metrics, NaN-skipping (impressions without both
    classes contribute nothing, matching sklearn's refusal + the reference's
    per-impression averaging, ``train_eval.py:256-273``).

    Uses a thread pool for large eval sets (numpy releases the GIL in the
    sort-dominated inner loop) — the reference forks a process pool
    (``train_eval.py:256-260``).
    """
    if parallel is None:
        parallel = len(labels) > 20_000

    def one(args):
        y, s = args
        return impression_metrics(np.asarray(y), np.asarray(s))

    pairs = list(zip(labels, scores))
    if parallel:
        workers = max(2, (os.cpu_count() or 4) // 2)
        with concurrent.futures.ThreadPoolExecutor(workers) as ex:
            per = list(ex.map(one, pairs, chunksize=1024))
    else:
        per = [one(p) for p in pairs]

    out: Dict[str, float] = {}
    for key in ("auc", "mrr", "ndcg@5", "ndcg@10"):
        vals = np.asarray([p[key] for p in per])
        out[key] = float(np.nanmean(vals)) if len(vals) else float("nan")
    return out


def score_submission_file(
    submission_path,
    labels_by_key: Dict[int, np.ndarray],
) -> Dict[str, float]:
    """Score a MIND leaderboard rank file against ground-truth labels.

    This is the official-scorer role the reference ships commented out
    (``MIND_2020/evaluation.py:29-118``). Lines are
    ``"<impression_id> [r1,r2,...]"``; ranks convert to scores as ``1/rank``.
    ``labels_by_key`` maps impression id -> 0/1 label array in candidate
    order (truncated/padded to the rank-list length like the reference's
    ``rank_score[i][:len(y_true)]``, ``train_eval.py:225``).
    """
    labels, scores = [], []
    with open(submission_path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            key_str, rank_str = line.split(" ", 1)
            key = int(key_str)
            if key not in labels_by_key:
                continue
            ranks = np.asarray(
                [int(r) for r in rank_str.strip()[1:-1].split(",")],
                dtype=np.float64)
            y = np.asarray(labels_by_key[key], dtype=np.float64)
            n = min(len(ranks), len(y))
            labels.append(y[:n])
            scores.append(1.0 / ranks[:n])
    return aggregate_metrics(labels, scores)
