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

import os
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding


def _already_initialized() -> bool:
    """True iff ``jax.distributed.initialize`` already ran in this process.

    Checked via the distributed service's own state object — NOT via
    ``jax.process_count()``, whose call initializes the JAX backend and
    thereby makes a subsequent ``jax.distributed.initialize`` fail (the
    round-2 bug: the wrapper's first statement poisoned the path it was
    wrapping, and the blanket ``except`` then silently trained N independent
    single-host jobs)."""
    try:
        from jax._src import distributed as _dist
        return _dist.global_state.client is not None
    except Exception:
        # Private-module layout changed: fall back to attempting init and
        # letting the specific "already initialized" error surface below.
        return False


def cluster_env_detected() -> bool:
    """Best-effort: does the environment describe a multi-process cluster?

    Pure env-var inspection — touches no JAX backend state. Covers the
    launchers ``jax.distributed.initialize()`` can auto-configure from:
    Cloud TPU pods (metadata-provided worker lists), SLURM, Open MPI, and
    an explicit JAX coordinator address.

    ``NEWSREC_NO_DISTRIBUTED=1`` (any non-empty value other than ``0``)
    vetoes detection: a deliberately single-process run inside e.g. a
    multi-task SLURM allocation (tasks reserved for other work) would
    otherwise call ``jax.distributed.initialize()`` and block forever
    waiting for peers that never connect. The ``train`` CLI exposes this
    as ``--no-distributed``."""
    env = os.environ
    if env.get("NEWSREC_NO_DISTRIBUTED", "0") not in ("", "0"):
        return False
    if env.get("JAX_COORDINATOR_ADDRESS"):
        return True
    hosts = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([h for h in hosts.split(",") if h.strip()]) > 1:
        return True
    if env.get("MEGASCALE_COORDINATOR_ADDRESS"):
        return True
    try:
        if int(env.get("SLURM_NTASKS", env.get("SLURM_NPROCS", "1"))) > 1:
            return True
    except ValueError:
        pass
    try:
        if int(env.get("OMPI_COMM_WORLD_SIZE", "1")) > 1:
            return True
    except ValueError:
        pass
    return False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Bring up the multi-host runtime. Returns True iff a process group
    exists afterwards (already up, or brought up here).

    Call ONCE per process, BEFORE any other jax API use (anything that
    initializes the backend — ``jax.devices()``, ``jax.process_count()``, a
    first jnp op — makes process-group formation impossible).

    Three modes, replacing the reference's broken ``--n_GPUs`` DataParallel
    path (``model/__init__.py:34-36``):

    * explicit args (manual clusters): all three must be given together;
    * no args on a recognized cluster launcher (Cloud TPU pod / SLURM /
      Open MPI / ``JAX_COORDINATOR_ADDRESS``): auto-configured by
      ``jax.distributed.initialize()``;
    * no args, no cluster env: genuine single-process run — returns False
      without touching JAX at all.

    Failures are LOUD: if a cluster was requested (args or detected env)
    and the group cannot form, the error propagates — silently falling back
    would train N independent single-host jobs."""
    if _already_initialized():
        return True
    explicit = any(a is not None
                   for a in (coordinator_address, num_processes, process_id))
    if explicit:
        missing = [n for n, a in (("coordinator_address", coordinator_address),
                                  ("num_processes", num_processes),
                                  ("process_id", process_id)) if a is None]
        if missing:
            raise ValueError(
                "initialize(): explicit cluster spec requires all of "
                f"coordinator_address/num_processes/process_id; missing "
                f"{missing}")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id)
        return True
    if cluster_env_detected():
        jax.distributed.initialize()  # auto-config from the launcher env
        return True
    return False  # single-process: leave JAX untouched


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
