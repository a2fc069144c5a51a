"""Multi-device SPMD tests on the 8-device virtual CPU mesh: sharded init,
sharded train step, and equivalence of data-parallel vs single-device math."""

import dataclasses

import jax
import numpy as np
from jax.sharding import PartitionSpec as P

from pytorch_news_recommender_tpu.config import MeshConfig
from pytorch_news_recommender_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
)
from pytorch_news_recommender_tpu.train.loop import Trainer


def test_mesh_shapes():
    assert len(jax.devices()) == 8
    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    assert mesh.shape == {"data": 4, "model": 2}
    mesh = make_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1}


def test_param_shardings_rules():
    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    params = {
        "news_encoder": {"word_embedding": {"embedding": np.zeros((600, 64))}},
        "dense": {"kernel": np.zeros((64, 64))},
    }
    sh = param_shardings(params, mesh)
    assert sh["news_encoder"]["word_embedding"]["embedding"].spec == P("model", None)
    assert sh["dense"]["kernel"].spec == P()


def test_param_shardings_uneven_falls_back():
    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    params = {"word_embedding": {"embedding": np.zeros((601, 64))}}
    sh = param_shardings(params, mesh)
    assert sh["word_embedding"]["embedding"].spec == P()


def test_sharded_train_step_runs(cfg, dataset):
    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    trainer = Trainer(cfg, dataset, mesh=mesh)
    state = trainer.init_state(seed=0)
    # Embedding table is actually sharded over the model axis.
    emb = state.params["news_encoder"]["word_embedding"]["embedding"]
    assert emb.sharding.spec == P("model", None)
    from pytorch_news_recommender_tpu.data.loader import train_batches
    rng = jax.random.PRNGKey(0)
    batch = next(train_batches(dataset.train, 32, np.random.default_rng(0)))
    state, m = trainer.run_step(state, batch, rng)
    assert np.isfinite(float(m["loss"]))


def test_data_parallel_matches_single_device(cfg, dataset):
    """Same seed, same batch: 8-way DP step must equal 1-device step."""
    mesh8 = make_mesh(MeshConfig(), devices=jax.devices())
    mesh1 = make_mesh(MeshConfig(), devices=jax.devices()[:1])
    t8 = Trainer(cfg, dataset, mesh=mesh8)
    t1 = Trainer(cfg, dataset, mesh=mesh1)
    s8 = t8.init_state(seed=0)
    s1 = t1.init_state(seed=0)
    from pytorch_news_recommender_tpu.data.loader import train_batches
    batch = next(train_batches(dataset.train, 32, np.random.default_rng(1)))
    rng = jax.random.PRNGKey(3)
    s8, m8 = t8.run_step(s8, batch, rng)
    s1, m1 = t1.run_step(s1, batch, rng)
    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]),
                               rtol=1e-5, atol=1e-6)
    l8 = jax.tree_util.tree_leaves(s8.params)
    l1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(l8, l1):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-5)


def test_embedding_lookup_schedules_match_auto(cfg, dataset):
    """A dedup train step on the dp4 x mp2 mesh with the hand-scheduled
    psum / a2a embedding lookups must match the auto (XLA-collective) path:
    identical loss (each row's value comes from exactly one shard, so the
    psum adds exact zeros) and near-identical updated params (scatter-order
    float addition in the backward)."""
    import pytest

    from pytorch_news_recommender_tpu.data.loader import train_batches

    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    batch = next(train_batches(dataset.train, 32, np.random.default_rng(2),
                               dedup=True))
    losses, params = {}, {}
    for sched in ("auto", "psum", "a2a"):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model,
                                           embedding_lookup=sched))
        tr = Trainer(c, dataset, mesh=mesh)
        s = tr.init_state(seed=0)
        s, m = tr.run_step(s, batch, jax.random.PRNGKey(1))
        losses[sched] = float(m["loss"])
        params[sched] = s.params
    for sched in ("psum", "a2a"):
        assert losses[sched] == pytest.approx(losses["auto"], abs=1e-6), (
            sched, losses)
        for a, b in zip(jax.tree_util.tree_leaves(params[sched]),
                        jax.tree_util.tree_leaves(params["auto"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-5)


def test_a2a_schedule_overflow_poisons_not_silent(cfg, dataset):
    """An undersized a2a capacity factor must surface as a non-finite loss
    (NaN poison), never as silently-wrong embeddings."""
    from pytorch_news_recommender_tpu.data.loader import train_batches

    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    c = dataclasses.replace(
        cfg, model=dataclasses.replace(
            cfg.model, embedding_lookup="a2a", a2a_capacity_factor=0.02))
    tr = Trainer(c, dataset, mesh=mesh)
    s = tr.init_state(seed=0)
    batch = next(train_batches(dataset.train, 32, np.random.default_rng(2),
                               dedup=True))
    _, m = tr.run_step(s, batch, jax.random.PRNGKey(1))
    assert not np.isfinite(float(m["loss"]))


def test_sharded_step_with_length_split(cfg, dataset):
    """A deduplicated + length-partitioned batch must run (and stay finite)
    through the fully sharded train step on the dp x mp mesh."""
    import dataclasses

    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.data.loader import (
        LengthSplit, train_batches)

    ds = synthetic.generate(cfg.data, seed=11, n_train=128, n_dev=8,
                            title_len=(11.5, 3.5))
    mesh = make_mesh(MeshConfig(model_parallel_size=2))
    trainer = Trainer(cfg, ds, mesh=mesh)
    assert trainer._length_split is not None
    trainer._length_split = dataclasses.replace(trainer._length_split,
                                                grid=64)
    state = trainer.init_state(seed=0)
    batch = next(train_batches(ds.train, 32, np.random.default_rng(0),
                               dedup=True,
                               length_split=trainer._length_split))
    assert "short_mark" in batch
    state, m = trainer.run_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
