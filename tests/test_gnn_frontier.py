"""GNN frontier dedup: the closure-deduplicated encode must bit-match the
recursive-gather path (round-3 verdict weak #4: 1+K+K^2 title encodes per
unique news with no dedup across the expanded frontier).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_news_recommender_tpu import models as M
from pytorch_news_recommender_tpu.data.loader import (
    add_gnn_frontier,
    dedup_batch,
    train_batches,
)


def _gnn(cfg, full_dataset):
    model_cfg = dataclasses.replace(
        cfg.model.with_artifact_meta(full_dataset.meta), name="gnn")
    model = M.build_model(model_cfg)
    news_feats = {k: jnp.asarray(v)
                  for k, v in full_dataset.news.as_dict().items()}
    batch_np = next(train_batches(full_dataset.train, 16,
                                  np.random.default_rng(0)))
    rng = jax.random.PRNGKey(0)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    params = model.init({"params": rng, "dropout": rng}, batch, news_feats,
                        deterministic=True)["params"]
    return model, model_cfg, params, news_feats, batch_np


def test_add_gnn_frontier_closure_properties(full_dataset):
    nb = full_dataset.news.neighbors
    raw = {
        "browsed_ids": full_dataset.train.browsed_ids[:8],
        "candidate_ids": full_dataset.train.candidate_ids[:8],
    }
    db = dedup_batch(raw, buckets=(64, 128, 256))
    fb = add_gnn_frontier(db, nb, depth=2, buckets=(64, 128, 256, 512, 1024))
    fids = fb["gnn_frontier_ids"]
    assert fids[0] == 0
    # every unique id present, self_pos maps back exactly
    np.testing.assert_array_equal(fids[fb["gnn_self_pos"]],
                                  db["unique_ids"])
    # depth-1 closure: every neighbor of a unique id is in the frontier
    uniq = np.unique(db["unique_ids"])
    n1 = np.unique(nb[uniq])
    assert np.isin(n1, fids).all()
    # nbr_pos decodes to the true neighbor ids for depth<=1 nodes
    present = set(fids.tolist())
    for i, fid in enumerate(fids):
        if fid == 0 or fid not in set(np.union1d(uniq, n1).tolist()):
            continue
        decoded = fids[fb["gnn_nbr_pos"][i]]
        expect = np.where(np.isin(nb[fid], list(present)), nb[fid], 0)
        np.testing.assert_array_equal(decoded, expect)


def test_frontier_scores_match_recursive(cfg, full_dataset):
    model, model_cfg, params, news_feats, batch_np = _gnn(cfg, full_dataset)
    db = dedup_batch(batch_np, buckets=(64, 128, 256))
    assert "unique_ids" in db
    fb = add_gnn_frontier(db, full_dataset.news.neighbors,
                          depth=model_cfg.gnn_layers)
    assert "gnn_frontier_ids" in fb

    s_rec = model.apply({"params": params},
                        {k: jnp.asarray(v) for k, v in db.items()},
                        news_feats, deterministic=True)
    s_fr = model.apply({"params": params},
                       {k: jnp.asarray(v) for k, v in fb.items()},
                       news_feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(s_rec), np.asarray(s_fr),
                               rtol=2e-4, atol=2e-4)


def test_frontier_grads_match_recursive(cfg, full_dataset):
    from pytorch_news_recommender_tpu.train.loop import softmax_ce_loss

    model, model_cfg, params, news_feats, batch_np = _gnn(cfg, full_dataset)
    db = dedup_batch(batch_np, buckets=(64, 128, 256))
    fb = add_gnn_frontier(db, full_dataset.news.neighbors,
                          depth=model_cfg.gnn_layers)

    def loss(p, b):
        b = {k: jnp.asarray(v) for k, v in b.items()}
        return softmax_ce_loss(model.apply({"params": p}, b, news_feats,
                                           deterministic=True))

    g_rec = jax.grad(lambda p: loss(p, db))(params)
    g_fr = jax.grad(lambda p: loss(p, fb))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_rec)
    flat_f = jax.tree_util.tree_leaves(g_fr)
    scale = max(float(np.max(np.abs(np.asarray(a)))) for _, a in flat_r)
    for (path, a), b in zip(flat_r, flat_f):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) / scale
        assert err < 5e-4, (jax.tree_util.keystr(path), err)


def test_trainer_injects_frontier_and_levelwise_corpus(cfg, full_dataset):
    """Trainer wires the frontier into run_step/fit automatically, and the
    level-wise corpus encode matches the recursive per-id encode."""
    from pytorch_news_recommender_tpu.config import Config
    from pytorch_news_recommender_tpu.train.loop import Trainer

    d = cfg.to_dict()
    d["model"]["name"] = "gnn"
    tr = Trainer(Config.from_dict(d), full_dataset)
    assert tr._frontier_depth == tr.model_cfg.gnn_layers

    raw = next(train_batches(full_dataset.train, 16,
                             np.random.default_rng(0)))
    db = dedup_batch(raw, buckets=(64, 128, 256))
    state = tr.init_state(seed=0)
    state, m = tr.run_step(state, db, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))

    # level-wise corpus vectors == recursive per-id encode
    vecs = tr.compute_news_vectors(state.params)
    n = full_dataset.news.n_news
    ids = jnp.arange(n, dtype=jnp.int32)
    ref = tr.model.apply({"params": state.params}, ids, tr.news_feats, True,
                         method="encode_news_ids")
    np.testing.assert_allclose(np.asarray(vecs), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_levelwise_corpus_matches_recursive_at_zero_layers(cfg, full_dataset):
    """gnn_layers=0: the model still builds one GAT layer (max(1, L),
    models/gnn.py) — the level-wise corpus encode and the frontier depth
    must use the same effective depth, or eval silently scores with
    GAT-free vectors (round-4 review finding)."""
    from pytorch_news_recommender_tpu.config import Config
    from pytorch_news_recommender_tpu.train.loop import Trainer

    d = cfg.to_dict()
    d["model"]["name"] = "gnn"
    d["model"]["gnn_layers"] = 0
    tr = Trainer(Config.from_dict(d), full_dataset)
    assert tr._frontier_depth == 1  # matches len(model.gat_layers)
    state = tr.init_state(seed=0)
    vecs = tr.compute_news_vectors(state.params)
    n = full_dataset.news.n_news
    ids = jnp.arange(n, dtype=jnp.int32)
    ref = tr.model.apply({"params": state.params}, ids, tr.news_feats, True,
                         method="encode_news_ids")
    np.testing.assert_allclose(np.asarray(vecs), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
