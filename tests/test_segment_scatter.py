"""MXU segment-scatter kernel vs XLA scatter-add (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_news_recommender_tpu.ops.pallas.segment_scatter import (
    dedup_gather,
    scatter_add_rows,
)


@pytest.mark.parametrize("U,S,D", [(64, 200, 32), (130, 1000, 48)])
def test_scatter_matches_xla(U, S, D):
    rng = np.random.default_rng(0)
    # Zipf-style heavy duplication
    idx = jnp.asarray(rng.zipf(1.5, size=S) % U, jnp.int32)
    g = jnp.asarray(rng.standard_normal((S, D)), jnp.float32)
    ours = scatter_add_rows(idx, g, U, block_u=64, block_s=256,
                            interpret=True)
    ref = jnp.zeros((U, D), jnp.float32).at[idx].add(g)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_dedup_gather_grad_matches_take():
    rng = np.random.default_rng(1)
    U, D = 96, 32
    table = jnp.asarray(rng.standard_normal((U, D)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, U, size=(8, 17)), jnp.int32)
    cot = jnp.asarray(rng.standard_normal((8, 17, D)), jnp.float32)

    def loss_ours(t):
        return jnp.sum(dedup_gather(t, idx, True) * cot)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, idx, axis=0) * cot)

    # forward identical
    np.testing.assert_allclose(loss_ours(table), loss_ref(table), rtol=1e-6)
    g1 = jax.grad(loss_ours)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-5, atol=1e-5)


def test_resolve_batch_dedup_gather_parity(cfg, dataset):
    """resolve_batch's pallas dedup_gather path (interpret mode) must give
    the same loss/grads as the jnp.take path."""
    import dataclasses

    from pytorch_news_recommender_tpu.data.loader import train_batches
    from pytorch_news_recommender_tpu.train.loop import Trainer, softmax_ce_loss

    def grads_for(use_pallas):
        c = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, use_pallas=use_pallas, pallas_interpret=True))
        tr = Trainer(c, dataset)
        state = tr.init_state(seed=0)
        batch_np = next(train_batches(dataset.train, 32,
                                      np.random.default_rng(0), dedup=True,
                                      unique_buckets=(64, 128, 256, 512)))
        assert "unique_ids" in batch_np, "need a dedup batch for this test"
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        def loss(params):
            scores = tr.model.apply({"params": params}, batch, tr.news_feats,
                                    deterministic=True)
            return softmax_ce_loss(scores)

        return jax.value_and_grad(loss)(state.params)

    (l_ref, g_ref) = grads_for(False)
    (l_pal, g_pal) = grads_for(True)
    np.testing.assert_allclose(float(l_ref), float(l_pal), rtol=2e-3)
    ref_leaves = jax.tree_util.tree_leaves(g_ref)
    pal_leaves = jax.tree_util.tree_leaves(g_pal)
    for a, b in zip(ref_leaves, pal_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-2, atol=5e-3)
