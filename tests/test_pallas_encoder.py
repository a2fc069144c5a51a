"""Fused Pallas encoder vs the pure-jnp golden chain (interpret mode on CPU).

Validation strategy per SURVEY.md §7: every kernel is checked against the
``ops/attention.py`` reference implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_news_recommender_tpu.ops import attention as A
from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
    _block_geometry,
    fused_news_encoder,
)


def _params(rng, D, Q):
    return dict(
        wqkv=jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.float32),
        bqkv=jnp.asarray(rng.normal(size=(3 * D,)) * 0.01, jnp.float32),
        wo=jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.float32),
        bo=jnp.asarray(rng.normal(size=(D,)) * 0.01, jnp.float32),
        aw=jnp.asarray(rng.normal(size=(D, Q)) * 0.05, jnp.float32),
        ab=jnp.asarray(rng.normal(size=(Q,)) * 0.01, jnp.float32),
        aq=jnp.asarray(rng.normal(size=(Q,)) * 0.1, jnp.float32),
    )


def _reference(x, mask, p, num_heads):
    h = A.multi_head_self_attention(
        x, p["wqkv"], p["bqkv"], p["wo"], p["bo"], num_heads, mask)
    return A.additive_attention(h, p["aw"], p["ab"], p["aq"], mask)


@pytest.mark.parametrize("M,L,D,H,Q", [
    (13, 20, 64, 4, 32),    # title-like, odd M exercises padding
    (8, 40, 64, 8, 32),     # abstract-like
    (9, 50, 96, 4, 48),     # history-like (user encoder geometry)
    (130, 20, 60, 10, 40),  # multiple grid blocks, dh=6
])
def test_fused_encoder_matches_reference(M, L, D, H, Q):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(M, L, D)), jnp.float32)
    # realistic masks: contiguous valid prefixes, including empty news
    lens = rng.integers(0, L + 1, size=M)
    lens[0] = 0          # fully padded news
    lens[1:3] = L        # full news
    mask = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
    x = x * mask[..., None]
    mask = jnp.asarray(mask)

    p = _params(rng, D, Q)
    expect = _reference(x, mask, p, H)
    got = fused_news_encoder(
        x, mask, **p, num_heads=H, dropout_rate=0.0, interpret=True)
    assert got.shape == (M, D)
    valid = np.asarray(lens) > 0
    np.testing.assert_allclose(
        np.asarray(got)[valid], np.asarray(expect)[valid],
        rtol=2e-4, atol=2e-4)


def test_block_geometry_alignment():
    for L in (10, 20, 30, 40, 50, 64):
        BM, P, SUB = _block_geometry(L)
        assert SUB % 8 == 0, (L, SUB)
        assert BM % P == 0
        assert (BM * L) % SUB == 0


def test_fused_encoder_dropout_statistics():
    """Dropout path: mean preserved (inverted dropout), variance added.

    Requires real TPU hardware — the CPU HLO interpreter lacks the TPU PRNG
    primitives and the TPU interpreter stubs them to zeros. Run via
    ``benchmarks/tpu_checks.py`` on hardware; skipped on CPU.
    """
    if jax.default_backend() != "tpu":
        pytest.skip("TPU PRNG not available off-hardware")
