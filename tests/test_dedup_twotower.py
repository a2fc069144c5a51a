"""Dedup batches and two-tower eval must be mathematically equivalent to the
direct path."""

import jax
import numpy as np

from pytorch_news_recommender_tpu.data.loader import dedup_batch, train_batches
from pytorch_news_recommender_tpu.train.loop import Trainer


def test_dedup_batch_roundtrip(dataset):
    batch = next(train_batches(dataset.train, 32, np.random.default_rng(0)))
    dd = dedup_batch(batch)
    assert dd["unique_ids"][0] == 0  # pad news occupies slot 0
    # Inverse mapping reconstructs the original ids exactly.
    np.testing.assert_array_equal(
        dd["unique_ids"][dd["browsed_idx"]], batch["browsed_ids"])
    np.testing.assert_array_equal(
        dd["unique_ids"][dd["candidate_idx"]], batch["candidate_ids"])
    # Unique table is sorted and padded with zeros.
    u = dd["unique_ids"]
    nz = u[u > 0]
    assert (np.diff(nz) > 0).all()


def test_dedup_scores_match_direct(cfg, dataset):
    trainer = Trainer(cfg, dataset)
    state = trainer.init_state(seed=0)
    batch = next(train_batches(dataset.train, 32, np.random.default_rng(1)))
    dd = dedup_batch(batch)

    import jax.numpy as jnp
    direct = trainer.model.apply(
        {"params": state.params},
        {k: jnp.asarray(v) for k, v in batch.items()},
        trainer.news_feats, deterministic=True)
    deduped = trainer.model.apply(
        {"params": state.params},
        {k: jnp.asarray(v) for k, v in dd.items()},
        trainer.news_feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(direct), np.asarray(deduped),
                               rtol=1e-5, atol=1e-5)


def test_two_tower_eval_matches_direct(cfg, dataset):
    import dataclasses
    trainer = Trainer(cfg, dataset)
    state = trainer.init_state(seed=0)
    m_tt = trainer.evaluate(state)

    d = cfg.to_dict()
    d["train"]["eval_two_tower"] = False
    from pytorch_news_recommender_tpu.config import Config
    cfg2 = Config.from_dict(d)
    trainer2 = Trainer(cfg2, dataset)
    m_direct = trainer2.evaluate(state)
    for k in ("auc", "mrr", "ndcg@5", "ndcg@10"):
        np.testing.assert_allclose(m_tt[k], m_direct[k], rtol=1e-4, atol=1e-5)


def test_train_with_dedup_improves(cfg, dataset):
    trainer = Trainer(cfg, dataset)
    state, _ = trainer.fit(num_epochs=6)
    m = trainer.evaluate(state)
    assert m["auc"] > 0.8, m
