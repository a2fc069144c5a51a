"""Fused news-encoder kernel: QKV -> multi-head attention -> output
projection -> (dropout) -> additive-attention pooling, one VMEM-resident pass.

Semantics match the jnp reference chain in ``ops/attention.py`` (which itself
mirrors ``MIND_2020/model/nrms_v1.py:109-162``): pairwise validity mask with
``-1e9`` fill, per-head ``1/sqrt(d_head)`` scaling, additive pooling
``softmax(tanh(xW+b)@q) . x`` over the token axis.

TPU-first layout decisions:

* The kernel processes a block of ``BM`` news per grid step; the ``[BM*L, D]``
  projections are large well-shaped MXU matmuls.
* Attention packs ``P`` news per ``SUB = P*L``-row subtile and computes one
  ``[SUB, SUB]`` score matrix per head with a block-diagonal mask, instead of
  ``BM*H`` separate ``[L, L]`` matmuls (whose (8,128)-tile padding wastes
  ~25x — the measured cost of the naive XLA lowering).
* Additive pooling avoids an awkward ``[BM*L] -> [BM, L]`` relayout by doing
  the per-news softmax with segment-indicator matmuls: a global (per-block)
  max shift keeps ``exp`` bounded, and ``pooled = (ind * e^T) @ X / ind @ e``.
* Optional inverted dropout on the projected attention output (the
  reference's post-MHSA dropout, ``nrms_v1.py:161``) runs in-kernel with the
  TPU PRNG so training needs no extra HBM round-trips; the same
  ``(seed, program_id)`` stream is regenerated bit-identically in the
  backward kernel.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e9


def _choose_packing(L: int, target_rows: int = 128) -> int:
    """News items packed per attention subtile: largest P with P*L a
    multiple of 8 (f32 sublane tile) and P*L near the 128-lane sweet spot."""
    best = 1
    for p in range(1, max(2, 2 * target_rows // L) + 1):
        if (p * L) % 8 == 0 and p * L <= 2 * target_rows:
            best = p
    if (best * L) % 8 != 0:
        # fall back: single news per subtile, rely on Mosaic relayouts
        best = 1
    return best


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(a, b)


def _block_geometry(L: int, block_news: int = 64,
                    pack_news: int | None = None) -> Tuple[int, int, int]:
    """Returns (BM, P, SUB): news per block, packing, subtile rows.

    BM must be a multiple of P (whole subtiles) AND of 8 (the output block's
    sublane tiling requires the leading block dim divisible by 8)."""
    P = pack_news if pack_news is not None else _choose_packing(L)
    step = _lcm(P, 8)
    BM = step * max(1, block_news // step)
    return BM, P, P * L


def _encoder_kernel(
    seed_ref,            # [1] int32 (scalar prefetch)
    x_ref,               # [BM*L, D] input tokens (embedded, bf16/f32)
    maskf_ref,           # [BM*L, 1] f32 token validity
    wqkv_ref, bqkv_ref,  # [D, 3D], [1, 3D]
    wo_ref, bo_ref,      # [D, D], [1, D]
    aw_ref, ab_ref,      # [D, Q], [1, Q]
    aq_ref,              # [Q, 1]
    out_ref,             # [BM, D]
    qkv_scratch,         # [BM*L, 3D] f32 scratch (staged projections)
    o_scratch,           # [BM*L, D] f32 scratch (attention output)
    *,
    L: int,
    H: int,
    P: int,
    dropout_rate: float,
):
    R, D = x_ref.shape
    BM = R // L
    SUB = P * L
    nsub = R // SUB
    dh = D // H
    scale = 1.0 / (dh ** 0.5)

    x = x_ref[:]
    qkv_scratch[:] = (
        jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    )  # [R, 3D] f32

    # Block-diagonal (per-news) mask for a packed subtile.
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0) // L
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1) // L
    blockdiag = (rows_n == cols_n).astype(jnp.float32)

    def subtile(s, _):
        r0 = pl.multiple_of(s * SUB, 8)
        mvec = maskf_ref[pl.ds(r0, SUB), :]  # [SUB, 1]
        pair = (
            jnp.dot(mvec, mvec.reshape(1, SUB),
                    preferred_element_type=jnp.float32)
            * blockdiag
        )
        for h in range(H):
            qh = qkv_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh]
            kh = qkv_scratch[pl.ds(r0, SUB), D + h * dh: D + (h + 1) * dh]
            vh = qkv_scratch[pl.ds(r0, SUB), 2 * D + h * dh: 2 * D + (h + 1) * dh]
            scores = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
            scores = jnp.where(pair > 0, scores * scale, NEG_INF)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(probs, vh, preferred_element_type=jnp.float32)
            o_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh] = o
        return 0

    jax.lax.fori_loop(0, nsub, subtile, 0)

    o1 = o_scratch[:].astype(x.dtype)
    o2 = (
        jnp.dot(o1, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[:]
    )  # [R, D] f32

    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.prng_random_bits((R, D))
        threshold = jnp.uint32(int(dropout_rate * (2 ** 32)))
        keep = pltpu.bitcast(bits, jnp.uint32) >= threshold
        o2 = jnp.where(keep, o2 / (1.0 - dropout_rate), 0.0)

    t = jnp.tanh(
        jnp.dot(o2.astype(x.dtype), aw_ref[:],
                preferred_element_type=jnp.float32)
        + ab_ref[:]
    )  # [R, Q] f32
    s = jnp.dot(t, aq_ref[:], preferred_element_type=jnp.float32)  # [R, 1]
    s = jnp.where(maskf_ref[:] > 0, s, NEG_INF)
    # Per-news softmax via segment matmuls; any constant shift cancels, so a
    # single block-wide max keeps exp() in range without a [BM, L] relayout.
    s = s - jnp.max(s)
    e = jnp.where(maskf_ref[:] > 0, jnp.exp(s), 0.0)  # [R, 1]
    ind_rows = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_cols = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_rows == ind_cols).astype(jnp.float32)
    weights = ind * e.reshape(1, R)  # [BM, R]
    num = jnp.dot(weights, o2, preferred_element_type=jnp.float32)  # [BM, D]
    den = jnp.dot(ind, e, preferred_element_type=jnp.float32)       # [BM, 1]
    out_ref[:] = (num / jnp.maximum(den, 1e-30)).astype(out_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "dropout_rate", "block_news", "pack_news",
                     "interpret"),
)
def fused_news_encoder(
    x: jax.Array,        # [M, L, D] embedded tokens (pad tokens zeroed)
    mask: jax.Array,     # [M, L] validity (1 = real token)
    wqkv: jax.Array,     # [D, 3D]
    bqkv: jax.Array,     # [3D]
    wo: jax.Array,       # [D, D]
    bo: jax.Array,       # [D]
    aw: jax.Array,       # [D, Q]
    ab: jax.Array,       # [Q]
    aq: jax.Array,       # [Q]
    *,
    num_heads: int,
    dropout_rate: float = 0.0,
    seed: jax.Array | int = 0,
    block_news: int = 64,
    pack_news: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused encoder forward: ``[M, L, D] -> [M, D]``.

    ``dropout_rate > 0`` applies in-kernel inverted dropout on the projected
    attention output (train mode); pass the same ``seed`` to the backward
    kernel for a bit-identical mask.
    """
    M, L, D = x.shape
    Q = aw.shape[1]
    BM, P, SUB = _block_geometry(L, block_news, pack_news)
    M_pad = -(-M // BM) * BM
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, M_pad - M), (0, 0)))
    grid = M_pad // BM
    R = BM * L

    x2 = x.reshape(M_pad * L, D)
    maskf = mask.reshape(M_pad * L, 1).astype(jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)

    kernel = functools.partial(
        _encoder_kernel, L=L, H=num_heads, P=P, dropout_rate=dropout_rate)

    flops_proj = 2 * M_pad * L * D * (3 * D + D + Q)
    flops_attn = 2 * 2 * (M_pad // P) * num_heads * SUB * SUB * (D // num_heads)
    flops_pool = 2 * M_pad * L * D

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((R, D), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1), lambda i, *_: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, 3 * D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 3 * D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, D), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((D, Q), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Q), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Q, 1), lambda i, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BM, D), lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((R, 3 * D), jnp.float32),
                pltpu.VMEM((R, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((M_pad, D), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops_proj + flops_attn + flops_pool,
            bytes_accessed=x2.size * x2.dtype.itemsize + M_pad * D * 4,
            transcendentals=M_pad * L * (SUB + Q),
        ),
        interpret=interpret,
    )(
        seed_arr, x2, maskf,
        wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1),
        aw, ab.reshape(1, -1), aq.reshape(-1, 1),
    )
    return out[:M]
