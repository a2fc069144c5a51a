"""shard_map embedding lookup vs plain jnp.take, on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_news_recommender_tpu.config import MeshConfig
from pytorch_news_recommender_tpu.parallel.mesh import make_mesh
from pytorch_news_recommender_tpu.parallel.sharded_embedding import (
    sharded_embedding_lookup,
    sharded_embedding_lookup_a2a,
)


def _setup(mp):
    mesh = make_mesh(MeshConfig(model_parallel_size=mp))
    rng = np.random.default_rng(0)
    V, D = 64, 16
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=(8, 5)), jnp.int32)
    return mesh, table, ids


def test_lookup_matches_take():
    for mp in (2, 4):
        mesh, table, ids = _setup(mp)
        out = sharded_embedding_lookup(table, ids, mesh)
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(jnp.take(table, ids, axis=0)),
                                   rtol=1e-6)


def test_lookup_grad_matches():
    mesh, table, ids = _setup(2)

    def loss_sharded(t):
        return jnp.sum(sharded_embedding_lookup(t, ids, mesh) ** 2)

    def loss_ref(t):
        return jnp.sum(jnp.take(t, ids, axis=0) ** 2)

    g1 = jax.grad(loss_sharded)(table)
    g2 = jax.grad(loss_ref)(table)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-5)


def test_a2a_lookup_matches_take():
    for mp in (2, 4):
        mesh, table, ids = _setup(mp)
        # generous capacity: uniform ids at this size never overflow
        out, dropped = sharded_embedding_lookup_a2a(
            table, ids, mesh, capacity_factor=float(mp))
        assert int(dropped) == 0
        np.testing.assert_allclose(np.asarray(out),
                                   np.asarray(jnp.take(table, ids, axis=0)),
                                   rtol=1e-6)


def test_a2a_overflow_detected_never_corrupts():
    """All ids hit ONE owner shard with a tiny capacity: the overflow must be
    reported, and in-capacity outputs must still be exact (zero rows only for
    the dropped slots)."""
    mesh = make_mesh(MeshConfig(model_parallel_size=4))
    rng = np.random.default_rng(1)
    V, D = 64, 16
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    # owner shard 3 holds rows [48, 64); all ids land there
    ids = jnp.asarray(rng.integers(48, 64, size=(8, 8)), jnp.int32)
    out, dropped = sharded_embedding_lookup_a2a(
        table, ids, mesh, capacity_factor=1.0)
    ref = np.asarray(jnp.take(table, ids, axis=0))
    got = np.asarray(out)
    assert int(dropped) > 0
    zero_rows = np.all(got == 0.0, axis=-1)
    ok_rows = ~zero_rows
    np.testing.assert_allclose(got[ok_rows], ref[ok_rows], rtol=1e-6)
    # exactly `dropped` slots zeroed (no silent wrong values)
    assert int(zero_rows.sum()) == int(dropped)


def test_a2a_pad_slots_never_count_as_dropped():
    """Divisibility pad slots must not consume owner-0 bucket capacity nor
    be counted in `dropped`: 9 ids on a 2x4 mesh pad to 16, and with
    capacity_factor=1.0 (cap=1 per peer-slice bucket) the 7 pads previously
    reported spurious drops even though every real row was exact."""
    mesh = make_mesh(MeshConfig(model_parallel_size=4))
    rng = np.random.default_rng(0)
    V, D = 64, 16
    table = jnp.asarray(rng.standard_normal((V, D)), jnp.float32)
    # owners cycle 0..3 so no (data, model, owner) bucket holds 2 real ids
    ids = jnp.asarray([0, 16, 32, 48, 1, 17, 33, 49, 2], jnp.int32)
    out, dropped = sharded_embedding_lookup_a2a(
        table, ids, mesh, capacity_factor=1.0)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.take(table, ids, axis=0)),
                               rtol=1e-6)


def test_a2a_lookup_under_jit_sharded_inputs():
    mesh, table, ids = _setup(2)
    from jax.sharding import NamedSharding, PartitionSpec as P
    table_s = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))
    fn = jax.jit(lambda t, i: sharded_embedding_lookup_a2a(
        t, i, mesh, capacity_factor=2.0))
    out, dropped = fn(table_s, ids_s)
    assert int(dropped) == 0
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.take(table, ids, axis=0)),
                               rtol=1e-6)


def test_lookup_under_jit_sharded_inputs():
    mesh, table, ids = _setup(4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    table_s = jax.device_put(table, NamedSharding(mesh, P("model", None)))
    ids_s = jax.device_put(ids, NamedSharding(mesh, P("data")))

    fn = jax.jit(lambda t, i: sharded_embedding_lookup(t, i, mesh))
    out = fn(table_s, ids_s)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(jnp.take(table, ids, axis=0)),
                               rtol=1e-6)
