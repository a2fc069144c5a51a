"""Hand-scheduled row-sharded embedding lookup over the device mesh.

The main training path row-shards the big tables (word 45.8k x 300, BERT-news
N x 512, entity) via ``param_shardings`` and lets XLA insert collectives.
This module is the explicit ``shard_map`` alternative for when the lookup
pattern should be controlled by hand (BASELINE.json north star: "row-sharded
across a multi-host TPU pod slice with all-to-all gather for lookup"):

* each device holds a contiguous row block ``[V/n, D]``;
* a lookup computes, PER DEVICE, the rows it owns (ids outside the local
  range contribute zeros) and then ``psum``s the partial gathers over the
  model axis — one ICI all-reduce of ``[n_ids, D]``, no host gathers, no
  dynamic shapes;
* gradients flow through ``jnp.take``'s scatter-add back to the local block
  only (the psum's transpose is an identity broadcast), so the backward pass
  is collective-free on the table.

For lookups where ``n_ids * D`` is much larger than the table shard (tiny
vocabularies), prefer the jit/auto path — the psum traffic would dominate.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.4.35 exposes shard_map at jax.shard_map
    from jax import shard_map as _shard_map_mod
    shard_map = _shard_map_mod.shard_map if hasattr(
        _shard_map_mod, "shard_map") else _shard_map_mod
except (ImportError, AttributeError):  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def sharded_embedding_lookup(
    table: jax.Array,      # [V, D], rows sharded over `model_axis`
    ids: jax.Array,        # [...] int32, batch dims sharded over `data_axis`
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
) -> jax.Array:
    """``[...] -> [..., D]`` lookup with local-gather + psum over the model
    axis. ``V`` must divide evenly by the model-axis size (pad the vocab)."""
    n_model = mesh.shape[model_axis]
    V = table.shape[0]
    assert V % n_model == 0, (V, n_model)

    lead = ids.shape
    flat = ids.reshape(-1)

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=P(data_axis, None),
    )
    def lookup(local_table, local_ids):
        rows = local_table.shape[0]
        start = jax.lax.axis_index(model_axis) * rows
        local = local_ids - start
        in_range = (local >= 0) & (local < rows)
        safe = jnp.clip(local, 0, rows - 1)
        out = jnp.take(local_table, safe, axis=0)
        out = out * in_range[..., None].astype(out.dtype)
        return jax.lax.psum(out, model_axis)

    return lookup(table, flat).reshape(*lead, table.shape[1])
