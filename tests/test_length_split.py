"""Length-bucketed unique-news encoding must be exact.

The dedup batch is partitioned into a short block (every thresholded word
feature fits; truncated on device) and a full-length block
(``loader.LengthSplit``). Because all towers mask on ``ids != 0`` and the
truncated columns are all-pad by construction, scores and gradients must
match the direct path bit-for-bit up to float tolerance — for EVERY family
that opts in (``LENGTH_SPLIT_OK``).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_news_recommender_tpu import models as M
from pytorch_news_recommender_tpu.data import synthetic
from pytorch_news_recommender_tpu.data.loader import (
    LengthSplit,
    dedup_batch,
    train_batches,
)
from pytorch_news_recommender_tpu.train.loop import Trainer, softmax_ce_loss

THR = 12


@pytest.fixture(scope="module")
def varlen_dataset(cfg):
    """All optional features + MIND-like variable title lengths."""
    return synthetic.generate(cfg.data, seed=3, n_train=512, n_dev=64,
                              bert_dim=64, n_users=50, n_neighbors=8,
                              n_entities=32, entity_dim=16,
                              title_len=(11.5, 3.5))


def _split(dataset, thr=THR, grid=64):
    lens = {"title": (dataset.news.title != 0).sum(1).astype(np.int32)}
    return LengthSplit(feat_lens=lens, thresholds={"title": thr}, grid=grid)


def _batch(dataset, batch_size=32, seed=0):
    return next(train_batches(dataset.train, batch_size,
                              np.random.default_rng(seed)))


def test_partition_invariants(varlen_dataset):
    batch = _batch(varlen_dataset)
    split = _split(varlen_dataset)
    dd = dedup_batch(batch, length_split=split)
    assert "short_mark" in dd, "split should engage on varlen data"
    ws = dd["short_mark"].shape[0]
    assert ws % split.grid == 0
    u = dd["unique_ids"]
    lens = split.feat_lens["title"]
    # pad news keeps slot 0; every id in the short block is truly short
    assert u[0] == 0
    assert (lens[u[:ws]] <= THR).all()
    # inverse mapping still reconstructs the original ids exactly
    np.testing.assert_array_equal(u[dd["browsed_idx"]], batch["browsed_ids"])
    np.testing.assert_array_equal(u[dd["candidate_idx"]],
                                  batch["candidate_ids"])
    # every real id survives the partition
    np.testing.assert_array_equal(
        np.unique(u[u > 0]),
        np.unique(np.concatenate([batch["browsed_ids"].ravel(),
                                  batch["candidate_ids"].ravel()]))[1:])


def test_partition_short_overflow():
    """When the quantized short width can't hold every short news, the
    overflow is encoded full-length in the long block (exact, less saving)."""
    ids = np.arange(1, 95, dtype=np.int32)  # 1..79 short, 80..94 long
    batch = {
        "browsed_ids": ids.reshape(1, -1),
        "candidate_ids": np.array([[1, 2, 80, 81, 5, 6]], np.int32),
    }
    lens = np.where(np.arange(100) < 80, 5, 20).astype(np.int32)
    split = LengthSplit(feat_lens={"title": lens}, thresholds={"title": 12},
                        grid=32)
    dd = dedup_batch(batch, buckets=(96,), length_split=split)
    u = dd["unique_ids"]
    np.testing.assert_array_equal(u[dd["browsed_idx"]], batch["browsed_ids"])
    np.testing.assert_array_equal(u[dd["candidate_idx"]],
                                  batch["candidate_ids"])
    # 95 uniques (80 short incl. pad + 15 long) in a 96-slot buffer:
    # short width quantizes to 64 < 80, overflow shorts join the long block
    ws = dd["short_mark"].shape[0]
    assert ws == 64
    assert (lens[u[:ws]] <= 12).all()


def _families():
    return M.available_models()


@pytest.mark.parametrize("name", _families())
def test_split_scores_match_direct(cfg, varlen_dataset, name):
    model_cfg = dataclasses.replace(
        cfg.model.with_artifact_meta(varlen_dataset.meta),
        name=name, short_title_len=THR)
    model = M.build_model(model_cfg)
    news_feats = {k: jnp.asarray(v)
                  for k, v in varlen_dataset.news.as_dict().items()}
    batch_np = _batch(varlen_dataset, 32, seed=1)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch, news_feats,
                        deterministic=True)["params"]

    s_direct = model.apply({"params": params}, batch, news_feats,
                           deterministic=True)

    # Opted-out families (gnn/npa/nrms_bert) must still be CORRECT when
    # handed a split batch — the marker is advisory and they skip the
    # truncation.
    dd_np = dedup_batch(batch_np, length_split=_split(varlen_dataset))
    assert "short_mark" in dd_np
    dd = {k: jnp.asarray(v) for k, v in dd_np.items()}
    s_split = model.apply({"params": params}, dd, news_feats,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(s_direct), np.asarray(s_split),
                               rtol=2e-4, atol=2e-4)


def test_split_grads_match_direct(cfg, varlen_dataset):
    """Word-table and tower gradients are unchanged by the split (nrms)."""
    model_cfg = dataclasses.replace(
        cfg.model.with_artifact_meta(varlen_dataset.meta),
        name="nrms", short_title_len=THR)
    model = M.build_model(model_cfg)
    news_feats = {k: jnp.asarray(v)
                  for k, v in varlen_dataset.news.as_dict().items()}
    batch_np = _batch(varlen_dataset, 32, seed=2)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch, news_feats,
                        deterministic=True)["params"]

    def loss(p, b):
        return softmax_ce_loss(
            model.apply({"params": p}, b, news_feats, deterministic=True))

    g_direct = jax.grad(loss)(params, batch)
    dd = {k: jnp.asarray(v)
          for k, v in dedup_batch(batch_np,
                                  length_split=_split(varlen_dataset)).items()}
    g_split = jax.grad(loss)(params, dd)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5),
        g_direct, g_split)


def test_corpus_encode_matches_unordered(cfg, varlen_dataset):
    """Length-ordered two-tower corpus encoding returns the same [N, D]
    table as the plain id-order path."""
    trainer = Trainer(cfg, varlen_dataset)
    assert trainer._length_split is not None
    state = trainer.init_state(seed=0)
    v_split = np.asarray(trainer.compute_news_vectors(state.params))

    trainer2 = Trainer(cfg, varlen_dataset)
    trainer2._length_split = None
    v_plain = np.asarray(trainer2.compute_news_vectors(state.params))
    np.testing.assert_allclose(v_split, v_plain, rtol=2e-5, atol=2e-5)


def test_trainer_enables_split_and_learns(cfg, varlen_dataset):
    """End-to-end: the Trainer builds the LengthSplit itself (tiny grid so
    it engages at test widths) and still learns the planted structure."""
    trainer = Trainer(cfg, varlen_dataset)
    assert trainer._length_split is not None
    trainer._length_split = dataclasses.replace(trainer._length_split,
                                                grid=64)
    state, _ = trainer.fit(num_epochs=6)
    m = trainer.evaluate(state)
    assert m["auc"] > 0.8, m


def test_all_short_batch(cfg, varlen_dataset):
    """Threshold above the max title length: every news is short, the long
    block is empty (short_width == width) and the model must encode the
    whole buffer truncated — without handing the kernel a zero-width
    slice."""
    model_cfg = dataclasses.replace(
        cfg.model.with_artifact_meta(varlen_dataset.meta),
        name="nrms", short_title_len=cfg.data.n_words_title)
    model = M.build_model(model_cfg)
    news_feats = {k: jnp.asarray(v)
                  for k, v in varlen_dataset.news.as_dict().items()}
    batch_np = _batch(varlen_dataset, 32, seed=4)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    rng = jax.random.PRNGKey(0)
    params = model.init({"params": rng, "dropout": rng}, batch, news_feats,
                        deterministic=True)["params"]
    s_direct = model.apply({"params": params}, batch, news_feats,
                           deterministic=True)

    split = _split(varlen_dataset, thr=cfg.data.n_words_title, grid=64)
    dd_np = dedup_batch(batch_np, length_split=split)
    assert "short_mark" in dd_np
    assert dd_np["short_mark"].shape[0] == dd_np["unique_ids"].shape[0]
    dd = {k: jnp.asarray(v) for k, v in dd_np.items()}
    s_split = model.apply({"params": params}, dd, news_feats,
                          deterministic=True)
    np.testing.assert_allclose(np.asarray(s_direct), np.asarray(s_split),
                               rtol=2e-4, atol=2e-4)


def test_auto_layouts_handles_shape_variants(cfg, varlen_dataset):
    """auto_layouts compiles per batch-shape variant: two batches with
    different dedup/short widths must both run (or cleanly fall back)."""
    d = cfg.to_dict()
    d["train"]["auto_layouts"] = True
    from pytorch_news_recommender_tpu.config import Config
    trainer = Trainer(Config.from_dict(d), varlen_dataset)
    trainer._length_split = dataclasses.replace(trainer._length_split,
                                                grid=64)
    state = trainer.init_state(seed=0)
    rng = jax.random.PRNGKey(0)
    b1 = dedup_batch(_batch(varlen_dataset, 32, seed=5),
                     length_split=trainer._length_split)
    b2 = dedup_batch(_batch(varlen_dataset, 48, seed=6),
                     length_split=trainer._length_split)
    assert ({k: v.shape for k, v in b1.items()}
            != {k: v.shape for k, v in b2.items()})
    state, m1 = trainer.run_step(state, b1, rng)
    state, m2 = trainer.run_step(state, b2, rng)
    assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m2["loss"]))
