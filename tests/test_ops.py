"""Unit tests for the pure-jnp attention ops (reference semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_news_recommender_tpu.ops import attention as A


def test_sdpa_matches_manual():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(2, 3, 5, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(2, 3, 5, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(2, 3, 5, 8)), jnp.float32)
    out = A.scaled_dot_product_attention(q, k, v)
    scores = np.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(8)
    probs = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    expect = np.einsum("bhqk,bhkd->bhqd", probs, v)
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_sdpa_mask_excludes_padded_keys():
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, 4, 8)), jnp.float32)
    mask = jnp.asarray([[1, 1, 0, 0]], jnp.float32)
    out = A.scaled_dot_product_attention(q, k, v, mask)
    # Perturbing masked keys/values must not change valid-query outputs.
    k2 = k.at[:, 2:].set(100.0)
    v2 = v.at[:, 2:].set(-50.0)
    out2 = A.scaled_dot_product_attention(q, k2, v2, mask)
    np.testing.assert_allclose(out[:, :2], out2[:, :2], rtol=1e-5, atol=1e-5)


def test_additive_attention_mask_and_weights():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, 6, 16)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(16, 8)), jnp.float32)
    b = jnp.zeros((8,), jnp.float32)
    q = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    mask = jnp.asarray(np.tile([1, 1, 1, 0, 0, 0], (3, 1)), jnp.float32)
    out = A.additive_attention(x, w, b, q, mask)
    # Masked positions must not contribute: recompute manually over valid 3.
    proj = np.tanh(np.einsum("bld,dq->blq", x, w))
    scores = np.einsum("blq,q->bl", proj, q)[:, :3]
    wts = jax.nn.softmax(jnp.asarray(scores), axis=-1)
    expect = np.einsum("bl,bld->bd", np.asarray(wts), np.asarray(x[:, :3]))
    np.testing.assert_allclose(out, expect, rtol=1e-5, atol=1e-5)


def test_mhsa_shapes_and_mask_invariance():
    rng = np.random.default_rng(3)
    D, H = 32, 4
    x = jnp.asarray(rng.normal(size=(2, 5, D)), jnp.float32)
    wqkv = jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.1, jnp.float32)
    bqkv = jnp.zeros((3 * D,), jnp.float32)
    wo = jnp.asarray(rng.normal(size=(D, D)) * 0.1, jnp.float32)
    bo = jnp.zeros((D,), jnp.float32)
    mask = jnp.asarray([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], jnp.float32)
    out = A.multi_head_self_attention(x, wqkv, bqkv, wo, bo, H, mask)
    assert out.shape == (2, 5, D)
    x2 = x.at[0, 3:].set(99.0)  # masked tokens of row 0
    out2 = A.multi_head_self_attention(x2, wqkv, bqkv, wo, bo, H, mask)
    np.testing.assert_allclose(out[0, :3], out2[0, :3], rtol=1e-4, atol=1e-4)


def test_dot_product_scores_masked():
    u = jnp.ones((2, 4), jnp.float32)
    c = jnp.ones((2, 3, 4), jnp.float32)
    m = jnp.asarray([[1, 1, 0], [1, 0, 0]], jnp.float32)
    s = A.dot_product_scores(u, c, m)
    assert s.shape == (2, 3)
    assert float(s[0, 0]) == 4.0
    assert float(s[0, 2]) <= -1e8
    assert float(s[1, 1]) <= -1e8


def test_masked_lookup_custom_vjp_matches_autodiff():
    """WordEmbedding's traffic-lean custom VJP must be bit-compatible with
    autodiff of take().astype(cd) * mask."""
    import numpy as np

    from pytorch_news_recommender_tpu.models.layers import _masked_lookup

    rng = np.random.default_rng(0)
    V, D, M, L = 200, 16, 8, 5
    table = jnp.asarray(rng.normal(size=(V, D)), jnp.float32)
    ids = jnp.asarray(rng.integers(0, V, size=(M, L)), jnp.int32)
    mask = jnp.asarray(rng.integers(0, 2, size=(M, L)), jnp.float32)

    def ref(table):
        out = jnp.take(table, ids, axis=0).astype(jnp.bfloat16)
        return jnp.sum(
            (out * mask[..., None].astype(out.dtype)).astype(jnp.float32) ** 2)

    def new(table):
        out = _masked_lookup(table, ids, mask, jnp.dtype(jnp.bfloat16))
        return jnp.sum(out.astype(jnp.float32) ** 2)

    v1, g1 = jax.value_and_grad(ref)(table)
    v2, g2 = jax.value_and_grad(new)(table)
    assert float(abs(v1 - v2)) == 0.0
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
