"""Family-generic model contract tests.

Every registered model must satisfy the RecModel contract:

* direct and deduplicated batch forms produce identical scores;
* the cached two-tower path (``score_from_vecs`` over corpus vectors encoded
  by id) matches the full forward in deterministic mode;
* padded candidates score ``-1e9`` (reference masked_fill semantics,
  ``MIND_2020/model/nrms_v1.py:291-292``);
* a jitted train step produces finite loss and nonzero grads.

New families added to the registry are covered automatically.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_news_recommender_tpu import models as M
from pytorch_news_recommender_tpu.data.loader import dedup_batch, train_batches
from pytorch_news_recommender_tpu.train.loop import Trainer, softmax_ce_loss

ALL_MODELS = M.available_models()


def _build(cfg, full_dataset, name):
    model_cfg = cfg.model.with_artifact_meta(full_dataset.meta)
    import dataclasses
    model_cfg = dataclasses.replace(model_cfg, name=name)
    model = M.build_model(model_cfg)
    news_feats = {k: jnp.asarray(v)
                  for k, v in full_dataset.news.as_dict().items()}
    batch_np = next(train_batches(full_dataset.train, 16,
                                  np.random.default_rng(0)))
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(0)
    variables = model.init({"params": rng, "dropout": rng}, batch, news_feats,
                           deterministic=True)
    return model, variables["params"], news_feats, batch_np


@pytest.mark.parametrize("name", ALL_MODELS)
def test_direct_vs_dedup_and_two_tower(cfg, full_dataset, name):
    model, params, news_feats, batch_np = _build(cfg, full_dataset, name)

    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s_direct = model.apply({"params": params}, batch, news_feats,
                           deterministic=True)
    assert s_direct.shape == batch_np["candidate_ids"].shape
    assert np.all(np.isfinite(np.asarray(s_direct)))

    dd = {k: jnp.asarray(v) for k, v in dedup_batch(batch_np).items()}
    s_dedup = model.apply({"params": params}, dd, news_feats,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(s_direct), np.asarray(s_dedup),
                               rtol=2e-4, atol=2e-4)

    # two-tower: encode the whole corpus by id, score from cached vectors
    # (skipped for families with user-conditioned news vectors, e.g. NPA)
    if getattr(model, "TWO_TOWER", True):
        n = full_dataset.news.n_news
        ids = jnp.arange(n, dtype=jnp.int32)
        news_vecs = model.apply({"params": params}, ids, news_feats, True,
                                method="encode_news_ids")
        s_tt = model.apply({"params": params}, batch, news_vecs, news_feats,
                           method="score_from_vecs")
        np.testing.assert_allclose(np.asarray(s_direct), np.asarray(s_tt),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_pad_candidates_masked(cfg, full_dataset, name):
    model, params, news_feats, batch_np = _build(cfg, full_dataset, name)
    batch_np = dict(batch_np)
    batch_np["candidate_ids"] = batch_np["candidate_ids"].copy()
    batch_np["candidate_ids"][:, -2:] = 0  # pad out the last two slots
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    s = np.asarray(model.apply({"params": params}, batch, news_feats,
                               deterministic=True))
    assert np.all(s[:, -2:] <= -1e8)
    assert np.all(s[:, 0] > -1e8)


@pytest.mark.parametrize("name", ALL_MODELS)
def test_train_step(cfg, full_dataset, name):
    """One optimizer step through the Trainer must run and move the loss."""
    import dataclasses
    d = cfg.to_dict()
    d["model"]["name"] = name
    d["train"]["batch_size"] = 16
    from pytorch_news_recommender_tpu.config import Config
    trainer = Trainer(Config.from_dict(d), full_dataset)
    state = trainer.init_state(seed=0)
    rng = jax.random.PRNGKey(0)
    losses = []
    for i, batch in enumerate(train_batches(
            full_dataset.train, 16, np.random.default_rng(0), dedup=True)):
        state, metrics = trainer.run_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
        if i >= 4:
            break
    assert all(np.isfinite(l) for l in losses), losses


def test_freeze_word_embeddings(cfg, full_dataset):
    """freeze_word_embeddings pins the GloVe table (the functional analogue
    of torch Embedding.from_pretrained(freeze=True), reference
    nrms.py:121-123) while the rest of the model still trains."""
    from pytorch_news_recommender_tpu.config import Config
    d = cfg.to_dict()
    d["model"]["name"] = "nrms"
    d["model"]["freeze_word_embeddings"] = True
    d["train"]["batch_size"] = 16
    trainer = Trainer(Config.from_dict(d), full_dataset)
    state = trainer.init_state(seed=0)
    w0 = np.asarray(state.params["news_encoder"]["word_embedding"]["embedding"])
    q0 = np.asarray(state.params["news_encoder"]["tower"]["wqkv"])
    batch = next(train_batches(full_dataset.train, 16,
                               np.random.default_rng(0)))
    state, _ = trainer.run_step(state, batch, jax.random.PRNGKey(0))
    w1 = np.asarray(state.params["news_encoder"]["word_embedding"]["embedding"])
    q1 = np.asarray(state.params["news_encoder"]["tower"]["wqkv"])
    assert np.array_equal(w0, w1), "frozen table moved"
    assert not np.array_equal(q0, q1), "tower params did not train"
