"""MIND leaderboard submission writer.

Reference semantics (``MIND_2020/train_eval.py:280-341``): score every test
impression, convert scores to 1-based ranks per impression (rank of candidate
``v`` = its position in the descending-score order + 1), and write lines
``"<impression_id> [r1,r2,...]"`` (``str(list).replace(' ','')`` format,
``train_eval.py:335-341`` — the reference numbers impressions ``i+1`` in file
order; we use the real impression ids captured at preprocessing when
available).

The scoring pass reuses the trainer's two-tower eval machinery (corpus
encoded once, bucketed ragged batches) instead of the reference's
pad-to-300 re-encoding loop.
"""

from __future__ import annotations

import pathlib
import time
from typing import Dict, Optional

import numpy as np

from pytorch_news_recommender_tpu.data.dataset import DevData


def scores_to_ranks(scores: np.ndarray) -> np.ndarray:
    """Descending-score 1-based ranks (``train_eval.py:280-286``)."""
    order = np.argsort(-scores, kind="stable")
    ranks = np.empty(len(scores), dtype=np.int32)
    ranks[order] = np.arange(1, len(scores) + 1)
    return ranks


def collect_scores(trainer, state_or_params, split: DevData,
                   max_impressions: Optional[int] = None) -> Dict[int, np.ndarray]:
    """Score a ragged split -> {row index: [c_i] float scores}."""
    from pytorch_news_recommender_tpu.data.loader import eval_batches, pad_batch
    import jax.numpy as jnp
    import jax

    params = getattr(state_or_params, "params", state_or_params)
    cfg = trainer.cfg
    bs = cfg.train.eval_batch_size
    two_tower = (cfg.train.eval_two_tower
                 and hasattr(trainer.model, "score_from_vecs"))
    if two_tower:
        news_vecs = trainer.compute_news_vectors(params)
        score_v = trainer.score_from_vecs_fn()
    else:
        score = trainer.score_fn()

    out: Dict[int, np.ndarray] = {}
    for eb in eval_batches(split, bs, cfg.data.eval_buckets, max_impressions):
        padded, b = pad_batch(eb.batch, bs)
        shards = trainer._batch_shardings(padded)
        batch = {k: jax.device_put(jnp.asarray(v), shards[k])
                 for k, v in padded.items()}
        if two_tower:
            s = np.asarray(score_v(params, batch, news_vecs))[:b]
        else:
            s = np.asarray(score(params, batch, trainer.news_feats))[:b]
        for j, imp in enumerate(eb.impression_ids):
            out[int(imp)] = s[j, : eb.n_candidates[j]]
    return out


def write_submission(
    trainer,
    state_or_params,
    split: Optional[DevData] = None,
    path: Optional[str | pathlib.Path] = None,
) -> pathlib.Path:
    """Score the test split and write the MIND submission file."""
    split = split if split is not None else trainer.dataset.test
    assert split is not None, "no test split"
    if path is None:
        ts = time.strftime("%m-%d_%H.%M", time.localtime())
        path = f"submit_{trainer.cfg.model.name}_{ts}.txt"
    path = pathlib.Path(path)

    scores = collect_scores(trainer, state_or_params, split)
    with open(path, "w") as f:
        for i in range(len(split)):
            if split.impression_keys is not None:
                key = int(split.impression_keys[i])
            else:
                key = i + 1
            sc = scores.get(i)
            if sc is None:  # impression with zero candidates: skip
                continue
            ranks = scores_to_ranks(sc)
            f.write(f"{key} [{','.join(str(int(r)) for r in ranks)}]\n")
    return path
