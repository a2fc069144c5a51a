"""Attention math as pure functions over parameter pytrees.

These are the golden reference implementations (and the CPU/test path) for the
fused Pallas kernels in ``ops/pallas``. Semantics follow the reference NRMS
stack but vectorized — no Python loops over the news axis:

* scaled dot-product attention with a pairwise validity mask built as the
  outer product of a 1-D mask, filled with ``-1e9``
  (reference ``MIND_2020/model/nrms_v1.py:20-40``);
* multi-head self-attention with fused QKV projection + output projection
  (reference ``nrms_v1.py:41-80`` uses three per-head-folded Linears — here a
  single ``[D, 3D]`` matmul feeds the MXU better);
* additive attention pooling ``softmax(tanh(xW + b) @ q)``
  (reference ``nrms_v1.py:83-105``);
* masked dot-product candidate scoring (reference ``nrms_v1.py:290-292``).

All matmuls request ``preferred_element_type=float32`` so bf16 inputs
accumulate in fp32 on the MXU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e9


def scaled_dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """``softmax(q kᵀ / sqrt(d)) v`` over the last two axes.

    Args:
      q, k, v: ``[..., L, d]``.
      mask: optional ``[..., L]`` validity mask (1 = valid). Expanded to a
        pairwise mask by outer product, matching the reference
        (``nrms_v1.py:28-31``); masked scores are filled with ``-1e9``.
    Returns:
      ``[..., L, d]`` attention output (dtype of ``v``).
    """
    d = q.shape[-1]
    scores = jnp.einsum(
        "...qd,...kd->...qk", q, k, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(d))
    if mask is not None:
        m = mask.astype(jnp.float32)
        pair = m[..., :, None] * m[..., None, :]  # [..., L, L]
        scores = jnp.where(pair > 0, scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "...qk,...kd->...qd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(v.dtype)


def multi_head_self_attention(
    x: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wo: jax.Array,
    bo: jax.Array,
    num_heads: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Multi-head self-attention over ``x: [..., L, D]``.

    ``wqkv: [D, 3D]`` (fused Q|K|V), ``wo: [D, D]``. Per-head dim is
    ``D // num_heads``; scaling is ``1/sqrt(d_head)`` as in the reference
    (``nrms_v1.py:22`` — scale applied after the head split).
    """
    *lead, L, D = x.shape
    dh = D // num_heads
    qkv = jnp.einsum("...ld,de->...le", x, wqkv,
                     preferred_element_type=jnp.float32).astype(x.dtype) + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def split_heads(t):
        t = t.reshape(*lead, L, num_heads, dh)
        return jnp.moveaxis(t, -2, -3)  # [..., H, L, dh]

    q, k, v = split_heads(q), split_heads(k), split_heads(v)
    hmask = None if mask is None else mask[..., None, :]  # broadcast over heads
    out = scaled_dot_product_attention(q, k, v, hmask)
    out = jnp.moveaxis(out, -3, -2).reshape(*lead, L, D)
    out = jnp.einsum("...ld,de->...le", out, wo,
                     preferred_element_type=jnp.float32).astype(x.dtype) + bo
    return out


def additive_attention(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    query: jax.Array,
    mask: jax.Array | None = None,
) -> jax.Array:
    """Additive-attention pooling: ``softmax(tanh(xW + b) @ q) · x``.

    Args:
      x: ``[..., L, D]`` sequence.
      w: ``[D, Q]`` projection, b: ``[Q]``, query: ``[Q]`` learned query.
      mask: optional ``[..., L]`` validity mask.
    Returns:
      ``[..., D]`` pooled vector.
    """
    return additive_attention_with_weights(x, w, b, query, mask)[0]


def additive_attention_with_weights(
    x: jax.Array,
    w: jax.Array,
    b: jax.Array,
    query: jax.Array,
    mask: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """As :func:`additive_attention` but also returns the ``[..., L]``
    softmax weights (the quantity the reference's commented-out TensorBoard
    hook logs, ``nrms_v0.py:94-122``). When the weights output is unused XLA
    dead-code-eliminates it, so this costs nothing on the hot path."""
    proj = jnp.tanh(
        jnp.einsum("...ld,dq->...lq", x, w,
                   preferred_element_type=jnp.float32) + b
    )
    scores = jnp.einsum("...lq,q->...l", proj, query.astype(proj.dtype),
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = jnp.where(mask > 0, scores, NEG_INF)
    weight = jax.nn.softmax(scores, axis=-1)
    pooled = jnp.einsum("...l,...ld->...d", weight.astype(x.dtype), x,
                        preferred_element_type=jnp.float32).astype(x.dtype)
    return pooled, weight


def dot_product_scores(
    user_vec: jax.Array,
    cand_vecs: jax.Array,
    cand_mask: jax.Array | None = None,
) -> jax.Array:
    """Click scores ``user · candidate`` with ``-1e9`` on padded candidates
    (reference ``nrms_v1.py:290-292``).

    Args:
      user_vec: ``[B, D]``; cand_vecs: ``[B, S, D]``; cand_mask: ``[B, S]``.
    Returns:
      ``[B, S]`` float32 scores.
    """
    scores = jnp.einsum("bd,bsd->bs", user_vec, cand_vecs,
                        preferred_element_type=jnp.float32)
    if cand_mask is not None:
        scores = jnp.where(cand_mask > 0, scores, NEG_INF)
    return scores
