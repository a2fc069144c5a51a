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

``sharded_embedding_lookup_a2a`` is the all-to-all dispatch variant (the
MoE-style exchange): each model-axis peer takes a 1/n slice of the ids,
routes each id to its owner shard over ``lax.all_to_all``, owners gather
their local rows, and a second all-to-all returns the responses. Per-link
traffic for the exchange is ``n_ids * D / n_model`` instead of the psum's
dense ``n_ids * D`` partials, so it wins when the model axis is wide and the
id stream is large — the regime the north star names ("row-sharded across a
multi-host pod slice with all-to-all gather for lookup"). Buckets are
static-shape with a capacity factor (ids are near-uniform over the vocab
after the loader's dedup); overflow is *detected and reported*, never
silent — callers assert ``dropped == 0`` or raise the factor.
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


# ---- active-mesh registry -------------------------------------------------
# The explicit schedules need the device mesh, but flax modules are built
# from ModelConfig alone. The Trainer registers its mesh here at
# construction; ``layers.WordEmbedding`` resolves it at trace time. With no
# registered mesh (serving, plain jit tests) every schedule falls back to
# the auto path.
_ACTIVE_MESH: list = [None]
_ACTIVE_DATA_AXIS: list = ["data"]


def set_active_mesh(mesh: Mesh | None, data_axis: str = "data") -> None:
    _ACTIVE_MESH[0] = mesh
    _ACTIVE_DATA_AXIS[0] = data_axis


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH[0]


def active_data_axis() -> str:
    """The batch axis NAME of the registered mesh (MeshConfig.data_axis) —
    consumers must resolve the axis by name, never by position (a
    caller-supplied mesh need not put it first)."""
    return _ACTIVE_DATA_AXIS[0]


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


def sharded_embedding_lookup_a2a(
    table: jax.Array,      # [V, D], rows sharded over `model_axis`
    ids: jax.Array,        # [...] int32, batch dims sharded over `data_axis`
    mesh: Mesh,
    model_axis: str = "model",
    data_axis: str = "data",
    capacity_factor: float = 2.0,
    skip_id: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """All-to-all dispatch lookup. Returns ``(out[..., D], dropped)`` where
    ``dropped`` is the global count of ids that overflowed their owner
    bucket (their output rows are zero). ``dropped == 0`` guarantees the
    result equals ``jnp.take(table, ids, axis=0)`` exactly — except slots
    equal to ``skip_id``, whose output rows are zero.

    ``skip_id`` marks a pad id whose slots are treated like divisibility
    pads: zero output, no bucket capacity consumed, never counted in
    ``dropped``. Masked lookups (mask == 0 exactly where id == 0) MUST pass
    ``skip_id=0``: dedup unique buffers are zero-padded to their bucket
    width, and those slots would otherwise all route to owner shard 0 and
    overflow its capacity no matter the factor.

    Schedule per device (data-row ``d``, model-peer ``m``):
      1. take the ``m``-th ``1/n_model`` slice of the row's ids;
      2. sort the slice by owner shard and pack into ``[n_model, C]``
         request buckets (``C`` = capacity; overflow slots routed to a
         trash column so in-capacity entries are never corrupted);
      3. ``all_to_all`` the buckets over the model axis — peer ``m`` now
         holds every peer's requests for *its* table block;
      4. local gather ``[n_model, C, D]``; ``all_to_all`` the rows back;
      5. unsort to slice order, zero overflow slots, ``all_gather`` the
         slices so every model peer holds the full ``[n_ids, D]`` block
         (activations downstream are data-parallel over the model axis).
    """
    n_model = mesh.shape[model_axis]
    n_data = mesh.shape[data_axis]
    V, D = table.shape
    assert V % n_model == 0, (V, n_model)
    rows = V // n_model

    lead = ids.shape
    flat = ids.reshape(-1)
    n_total = flat.shape[0]
    # pad so the id stream splits evenly over data shards and model peers
    chunk = n_data * n_model
    n_pad = (-n_total) % chunk
    if n_pad:
        flat = jnp.concatenate([flat, jnp.zeros((n_pad,), flat.dtype)])
    n_local = flat.shape[0] // n_data           # per data shard
    k = n_local // n_model                      # per model peer slice
    cap = max(1, min(k, int(-(-k * capacity_factor // n_model))))

    # The final all_gather makes the output bitwise-replicated over the
    # model axis, but the static replication checker cannot infer that
    # (psum it can; all_gather it can't) — so the check is disabled here.
    # Replication is asserted by tests/test_sharded_embedding.py instead.
    import inspect
    kw = ("check_vma" if "check_vma" in
          inspect.signature(shard_map).parameters else "check_rep")
    smap = partial(shard_map, **{kw: False})

    @partial(
        smap,
        mesh=mesh,
        in_specs=(P(model_axis, None), P(data_axis)),
        out_specs=(P(data_axis, None), P(data_axis)),
    )
    def lookup(local_table, local_ids):
        m = jax.lax.axis_index(model_axis)
        d = jax.lax.axis_index(data_axis)
        sl = jax.lax.dynamic_slice(local_ids, (m * k,), (k,))
        # Divisibility pad slots (appended before the shard_map) are NOT
        # real requests: give them a sentinel owner so they sort past every
        # real id — they never consume bucket capacity, are never counted
        # in `dropped`, and route to the trash column on dispatch.
        valid = (d * n_local + m * k + jnp.arange(k)) < n_total
        if skip_id is not None:
            valid &= sl != skip_id
        owner = jnp.where(valid, sl // rows, n_model)  # [k]; pads -> sentinel
        order = jnp.argsort(owner, stable=True)
        s_owner = owner[order]
        s_ids = sl[order]
        s_valid = valid[order]
        # rank within each owner bucket (pads are a trailing pseudo-bucket)
        start = jnp.searchsorted(s_owner, jnp.arange(n_model))
        pos = jnp.arange(k) - start[jnp.minimum(s_owner, n_model - 1)]
        ok = (pos < cap) & s_valid
        dropped = jnp.sum(s_valid & (pos >= cap)).astype(jnp.int32)
        # pack requests [n_model, cap] (+1 trash column for overflow/pads)
        disp = jnp.zeros((n_model, cap + 1), jnp.int32)
        disp = disp.at[jnp.minimum(s_owner, n_model - 1),
                       jnp.where(ok, pos, cap)].set(jnp.where(ok, s_ids, 0))
        disp = disp[:, :cap]
        # exchange requests; recv[j] = peer j's requests for MY block
        recv = jax.lax.all_to_all(
            disp, model_axis, split_axis=0, concat_axis=0, tiled=True)
        local_req = jnp.clip(recv - m * rows, 0, rows - 1)
        vals = jnp.take(local_table, local_req, axis=0)  # [n_model, cap, D]
        # send rows back; resp[o] = owner o's rows for my buckets
        resp = jax.lax.all_to_all(
            vals, model_axis, split_axis=0, concat_axis=0, tiled=True)
        got = resp[s_owner, jnp.clip(pos, 0, cap - 1)]   # [k, D] sorted order
        got = got * ok[:, None].astype(got.dtype)
        out_slice = jnp.zeros((k, D), got.dtype).at[order].set(got)
        out = jax.lax.all_gather(
            out_slice, model_axis, axis=0, tiled=True)   # [n_local, D]
        return out, jax.lax.psum(dropped, model_axis)[None]

    out, dropped = lookup(table, flat)
    out = out[:n_total].reshape(*lead, D)
    return out, jnp.sum(dropped)
