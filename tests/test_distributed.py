"""Multi-host feeding helpers (single-process semantics on the virtual
8-device mesh: this host owns the whole batch, so global assembly must be
equivalent to a sharded device_put)."""

import jax
import numpy as np

from pytorch_news_recommender_tpu.config import MeshConfig
from pytorch_news_recommender_tpu.parallel.distributed import (
    global_batch,
    initialize,
    process_local_slice,
)
from pytorch_news_recommender_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
)


def test_initialize_single_process_noop():
    initialize()  # must not raise without a coordinator
    assert jax.process_count() == 1


def test_process_local_slice_covers_batch():
    s = process_local_slice(64)
    assert (s.start, s.stop) == (0, 64)


def test_global_batch_matches_device_put():
    mesh_cfg = MeshConfig()
    mesh = make_mesh(mesh_cfg)
    shard = batch_sharding(mesh, mesh_cfg)
    local = {
        "browsed_ids": np.arange(64 * 5, dtype=np.int32).reshape(64, 5),
        "candidate_ids": np.arange(64 * 3, dtype=np.int32).reshape(64, 3),
    }
    out = global_batch(local, {k: shard for k in local},
                       {k: 64 for k in local})
    for k, v in local.items():
        assert out[k].shape == v.shape
        assert out[k].sharding == shard
        np.testing.assert_array_equal(np.asarray(out[k]), v)
