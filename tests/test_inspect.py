"""Attention-weight inspection (working version of the reference's
commented-out TensorBoard hook, ``nrms_v0.py:94-122``)."""

import jax.numpy as jnp
import numpy as np

from pytorch_news_recommender_tpu.data.loader import train_batches
from pytorch_news_recommender_tpu.train.loop import Trainer
from pytorch_news_recommender_tpu.utils.inspect import (
    attention_maps, attention_summary,
)


def test_attention_maps_and_summary(cfg, dataset):
    trainer = Trainer(cfg, dataset)
    state = trainer.init_state(seed=0)
    batch_np = next(train_batches(dataset.train, 16,
                                  np.random.default_rng(0), dedup=False))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

    maps = attention_maps(trainer.model, state.params, batch,
                          trainer.news_feats)
    assert maps, "no AdditiveAttention sites captured"
    # NRMS has (at least) a news-tower site over title words and a
    # user-tower site over the history axis.
    lens = sorted({w.shape[-1] for w in maps.values()})
    assert cfg.data.n_words_title in lens
    assert cfg.data.history_len in lens
    for w in maps.values():
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-3)
        assert (w >= 0).all()

    summ = attention_summary(maps)
    for s in summ.values():
        assert 0.0 <= s["entropy"] <= 1.0 + 1e-6
        assert abs(s["mean"] - 1.0 / s["seq_len"]) < 1e-3


def test_sow_does_not_change_scores(cfg, dataset):
    """The sow hook must be a no-op on the normal apply path."""
    trainer = Trainer(cfg, dataset)
    state = trainer.init_state(seed=0)
    batch_np = next(train_batches(dataset.train, 8,
                                  np.random.default_rng(1), dedup=False))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s1 = trainer.model.apply({"params": state.params}, batch,
                             trainer.news_feats, True)
    s2, _ = trainer.model.apply({"params": state.params}, batch,
                                trainer.news_feats, True,
                                mutable=["intermediates"])
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)
