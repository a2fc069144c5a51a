"""Device mesh and sharding rules.

The reference's only parallelism is a vestigial, broken ``data_parallel`` call
(``MIND_2020/model/__init__.py:34-36`` — guarded by always-true attributes).
Here parallelism is first-class SPMD over a ``jax.sharding.Mesh``:

* axis ``data``  — batch dimension; XLA all-reduces gradients over ICI.
* axis ``model`` — row-shards the large embedding tables (word / entity /
  BERT-news); lookups compile to all-gather / all-to-all collectives.

Everything rides ``jax.jit`` with ``NamedSharding`` constraints — no manual
collectives in the main path (``shard_map`` kernels live in
``parallel/sharded_embedding.py`` for the hand-optimized lookup).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_news_recommender_tpu.config import MeshConfig

# Parameter names (path regex -> PartitionSpec) for model-axis sharding.
# Embedding tables are the only params big enough to shard: rows over 'model'.
DEFAULT_PARTITION_RULES: tuple[tuple[str, P], ...] = (
    (r"word_embedding/embedding$", P("model", None)),
    (r"bert_embedding/embedding$", P("model", None)),
    (r"entity_embedding/embedding$", P("model", None)),
    (r".*", P()),
)


def make_mesh(
    cfg: MeshConfig = MeshConfig(),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    shape = cfg.mesh_shape(len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (cfg.data_axis, cfg.model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Leading (batch) axis split over the data axis."""
    return NamedSharding(mesh, P(cfg.data_axis))


def param_shardings(
    params,
    mesh: Mesh,
    rules: Sequence[tuple[str, P]] = DEFAULT_PARTITION_RULES,
):
    """Map a params pytree to NamedShardings via path-regex rules.

    A rule only applies if the spec's sharded axes divide the corresponding
    array dims evenly; otherwise the leaf falls back to replication (keeps
    tiny test vocabularies from tripping uneven-shard errors)."""

    def spec_fits(spec: P, shape) -> bool:
        if len(spec) > len(shape):
            # e.g. adafactor's factored v_row/v_col state for a rule-matched
            # 2-D table is rank-1 — replicate rather than over-rank shard
            return False
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            size = np.prod([mesh.shape[a] for a in
                            (axis if isinstance(axis, tuple) else (axis,))])
            if dim >= len(shape) or shape[dim] % int(size) != 0:
                return False
        return True

    def assign(path, leaf):
        name = "/".join(
            str(getattr(k, "key", getattr(k, "name", k))) for k in path
        )
        for pattern, spec in rules:
            if re.search(pattern, name):
                if spec_fits(spec, getattr(leaf, "shape", ())):
                    return NamedSharding(mesh, spec)
                return NamedSharding(mesh, P())
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)
