"""SPMD parallelism: device-mesh construction, sharding rules for params and
batches, and sharded embedding-table lookup over XLA collectives."""

from pytorch_news_recommender_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    replicated,
)

__all__ = ["make_mesh", "batch_sharding", "param_shardings", "replicated"]
