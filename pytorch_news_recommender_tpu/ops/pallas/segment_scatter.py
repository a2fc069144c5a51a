"""MXU-based row scatter-add: the backward of a duplicated-index row gather.

XLA lowers the transpose of ``jnp.take(table, idx)`` to ``scatter-add``,
which on TPU serializes badly when ``idx`` contains many duplicates — exactly
the news-recommendation case (Zipfian click popularity: the same hot news
appears in hundreds of histories per batch). Measured on v5e, the dedup
training step went from ~65 ms (near-unique ids) to ~940 ms (Zipf ids) with
the stock scatter.

This kernel reformulates the scatter as a blocked one-hot matmul computed
entirely in VMEM:

    dtable[u, :] = sum_s (idx[s] == u) * g[s, :]

* grid ``(U/BU, S/BS)``; each step builds the ``[BU, BS]`` one-hot indicator
  with two iota compares (never touches HBM) and issues ONE
  ``[BU, BS] @ [BS, D]`` MXU matmul, accumulating f32 into the output block
  across the S-axis grid steps (TPU grids execute sequentially, so the
  revisited output block is a race-free accumulator);
* cost is data-INDEPENDENT: ``2*U*S*D`` FLOPs on the MXU (e.g.
  U=12k, S=29k, D=300 -> ~0.2 TFLOP ~= 1 ms), versus a scatter whose latency
  scales with the worst duplicate count.

``dedup_gather`` wraps ``jnp.take`` with this kernel as its custom VJP — a
drop-in for gathers whose index distribution is heavy-tailed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scatter_kernel(idx_ref, g_ref, out_ref, *, BU: int):
    u = pl.program_id(0)
    s = pl.program_id(1)
    ids = idx_ref[0, :]                                     # [BS] int32
    BS = ids.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (BU, BS), 0) + u * BU
    onehot = (rows == ids[None, :]).astype(g_ref.dtype)     # [BU, BS]
    acc = jnp.dot(onehot, g_ref[:], preferred_element_type=jnp.float32)

    @pl.when(s == 0)
    def _():
        out_ref[:] = acc

    @pl.when(s != 0)
    def _():
        out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("num_rows", "block_u", "block_s",
                                             "interpret"))
def scatter_add_rows(
    idx: jax.Array,        # [S] int32 destination row per source row
    g: jax.Array,          # [S, D] source rows
    num_rows: int,         # U
    block_u: int = 512,
    block_s: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """``out[u] = sum_{s: idx[s]==u} g[s]`` as blocked one-hot matmuls.

    Returns ``[num_rows, D]`` float32.
    """
    S, D = g.shape
    BU = min(block_u, max(8, num_rows))
    U_pad = -(-num_rows // BU) * BU
    BS = min(block_s, max(128, S))
    S_pad = -(-S // BS) * BS
    if S_pad != S:
        # pad with an out-of-range id so padded rows match nothing
        idx = jnp.pad(idx, (0, S_pad - S), constant_values=U_pad)
        g = jnp.pad(g, ((0, S_pad - S), (0, 0)))

    out = pl.pallas_call(
        functools.partial(_scatter_kernel, BU=BU),
        grid=(U_pad // BU, S_pad // BS),
        in_specs=[
            pl.BlockSpec((1, BS), lambda u, s: (0, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BS, D), lambda u, s: (s, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BU, D), lambda u, s: (u, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((U_pad, D), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * U_pad * S_pad * D,
            bytes_accessed=S_pad * D * g.dtype.itemsize + U_pad * D * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(idx.reshape(1, -1).astype(jnp.int32), g)
    return out[:num_rows]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 3))
def _dedup_gather_impl(U: int, table, idx, interpret: bool):
    return jnp.take(table, idx, axis=0)


def _dg_fwd(U, table, idx, interpret):
    return jnp.take(table, idx, axis=0), idx


def _dg_bwd(U, interpret, idx, g):
    D = g.shape[-1]
    dtable = scatter_add_rows(idx.reshape(-1), g.reshape(-1, D), U,
                              interpret=interpret)
    # cotangent dtype == primal output dtype == table dtype (take preserves)
    return dtable.astype(g.dtype), None


_dedup_gather_impl.defvjp(_dg_fwd, _dg_bwd)


def dedup_gather(table: jax.Array, idx: jax.Array,
                 interpret: bool = False) -> jax.Array:
    """``jnp.take(table, idx, axis=0)`` whose backward is the MXU
    segment-scatter above instead of XLA's serialized scatter-add. Use for
    gathers with heavy-tailed duplicate indices (news ids under click
    popularity)."""
    return _dedup_gather_impl(table.shape[0], table, idx, interpret)
