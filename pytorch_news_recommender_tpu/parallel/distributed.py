"""Multi-host runtime: process-group init + per-host global-batch feeding.

The reference has no distributed runtime at all (SURVEY.md §2.3: the
``--n_GPUs`` DataParallel path is vestigial and broken,
``model/__init__.py:34-36``). TPU-native equivalent:

* ``initialize()`` — ``jax.distributed.initialize`` wrapper (coordinator
  discovery via env on Cloud TPU; explicit args elsewhere). Call ONCE per
  process before any jax op; afterwards ``jax.devices()`` spans the slice and
  the same ``Mesh``/``pjit`` code runs unchanged over ICI+DCN.
* ``global_batch()`` — each host feeds only its local shard of the batch;
  ``jax.make_array_from_process_local_data`` assembles the logical global
  ``jax.Array`` without any cross-host copy of the data itself.

The training loop (``train/loop.py``) is already mesh-agnostic: on a
multi-host slice, construct the mesh over all devices, shard each host's
batch slice with :func:`global_batch`, and XLA's collectives ride ICI.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op when single-process).

    On Cloud TPU pods the arguments are discovered from the metadata server /
    environment; pass them explicitly for manual clusters."""
    if jax.process_count() > 1:
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        # single-process run (no coordinator configured) — fine
        pass


def process_local_slice(n: int) -> slice:
    """This host's contiguous row range of a length-``n`` global batch."""
    p, np_ = jax.process_index(), jax.process_count()
    per = n // np_
    assert n % np_ == 0, (n, np_)
    return slice(p * per, (p + 1) * per)


def global_batch(
    local_batch: Dict[str, np.ndarray],
    shardings: Dict[str, NamedSharding],
    global_sizes: Optional[Dict[str, int]] = None,
) -> Dict[str, jax.Array]:
    """Assemble per-host numpy shards into global jax.Arrays.

    ``local_batch[k]`` holds THIS host's rows; ``global_sizes[k]`` the global
    leading size (default: ``local rows * process_count`` — the contiguous
    equal-slice layout produced by ``loader.train_batches_sliced``).
    Single-process: equivalent to a device_put."""
    np_ = jax.process_count()
    out = {}
    for k, v in local_batch.items():
        sharding = shardings[k]
        g = (global_sizes[k] if global_sizes is not None
             else v.shape[0] * np_)
        global_shape = (g,) + v.shape[1:]
        out[k] = jax.make_array_from_process_local_data(
            sharding, v, global_shape)
    return out


def fetch_global(arr: jax.Array) -> np.ndarray:
    """Full global value of a (possibly cross-process sharded) array on THIS
    host. Single-process: a plain np.asarray; multi-process: an all-gather
    over DCN via ``multihost_utils.process_allgather`` (used for eval score
    matrices — small ``[batch, bucket]`` blocks, so the gather is cheap)."""
    if jax.process_count() == 1:
        return np.asarray(arr)
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(arr, tiled=True))
