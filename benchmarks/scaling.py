"""Data-parallel scaling sweep: examples/sec and efficiency vs device count.

BASELINE.json's north star asks for >=85% scaling efficiency from 1 host to 2
hosts. Real multi-chip hardware is not attached in this environment, so by
default this runs on a virtual CPU device mesh
(``--xla_force_host_platform_device_count``) to validate the sharded step and
the measurement methodology end-to-end; on a real slice/pod, run it as-is
(it uses whatever ``jax.devices()`` exposes) for the true ICI/DCN numbers.

The GLOBAL batch is held per-device-constant (weak scaling, the standard
throughput protocol): batch = per_device_batch * n_devices. Efficiency(n) =
rate(n) / (n * rate(1)).

Run: python benchmarks/scaling.py [--devices 1 2 4 8] [--per-device-batch 64]
Prints one JSON line per mesh size plus a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--per-device-batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--cpu", action="store_true", default=None,
                    help="force the virtual CPU mesh (default when fewer "
                         "real devices than max(--devices))")
    args = ap.parse_args()

    want = max(args.devices)
    if args.cpu is None or args.cpu:
        os.environ.setdefault(
            "XLA_FLAGS",
            f"--xla_force_host_platform_device_count={want}")
        if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
            os.environ["XLA_FLAGS"] += (
                f" --xla_force_host_platform_device_count={want}")

    import jax

    if args.cpu is None and len(jax.devices()) < want:
        print(f"# only {len(jax.devices())} real device(s); re-run with "
              f"--cpu for the virtual mesh", file=sys.stderr)
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.data.loader import train_batches
    from pytorch_news_recommender_tpu.parallel.mesh import make_mesh
    from pytorch_news_recommender_tpu.train.loop import Trainer

    on_cpu = jax.devices()[0].platform == "cpu"
    results = {}
    for n in args.devices:
        if n > len(jax.devices()):
            print(f"# skipping n={n}: only {len(jax.devices())} devices",
                  file=sys.stderr)
            continue
        B = args.per_device_batch * n
        cfg = Config(
            data=DataConfig(dataset="synthetic"),
            model=ModelConfig(
                word_embed_size=300, num_attention_heads=10,
                user_heads_num=10, query_vector_dim=200,
                compute_dtype="float32" if on_cpu else "bfloat16",
                use_pallas=not on_cpu,
            ),
            train=TrainConfig(batch_size=B, dedup_batches=True),
        )
        ds = synthetic.generate(cfg.data, seed=0, n_news=20000,
                                vocab_size=45800, n_train=4 * B, n_dev=8,
                                title_len=(11.5, 3.5))
        mesh = make_mesh(cfg.mesh, devices=jax.devices()[:n])
        trainer = Trainer(cfg, ds, mesh=mesh)
        state = trainer.init_state(seed=0)
        rng = jax.random.PRNGKey(0)
        batches = list(train_batches(ds.train, B, np.random.default_rng(0),
                                     dedup=True,
                                     length_split=trainer._length_split))

        def step(state, i):
            s, _ = trainer.run_step(state, batches[i % len(batches)], rng)
            return s

        # warm every batch shape, then slope-method timing
        for i in range(len(batches)):
            state = step(state, i)
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        np.asarray(jax.device_get(leaf.ravel()[:1]))

        def run(k):
            nonlocal state
            t0 = time.perf_counter()
            for i in range(k):
                state = step(state, i)
            leaf = jax.tree_util.tree_leaves(state.params)[0]
            np.asarray(jax.device_get(leaf.ravel()[:1]))
            return time.perf_counter() - t0

        lo, hi = max(3, args.steps // 5), args.steps
        t_lo, t_hi = min(run(lo), run(lo)), min(run(hi), run(hi))
        ms = max((t_hi - t_lo) / (hi - lo) * 1e3, 1e-6)
        rate = B / ms * 1e3
        results[n] = rate
        eff = rate / (n * results[min(results)]) if min(results) in results else 1.0
        print(json.dumps({
            "devices": n, "global_batch": B, "ms_per_step": round(ms, 2),
            "examples_per_sec": round(rate, 1),
            "efficiency_vs_1": round(rate / (n * results[args.devices[0]]), 3)
            if args.devices[0] in results else None,
        }), flush=True)

    base = results.get(args.devices[0])
    if base:
        summary = {"scaling_efficiency": {
            n: round(r / (n / args.devices[0]) / base, 3)
            for n, r in results.items()}}
        if on_cpu:
            summary["note"] = (
                "virtual CPU mesh: all 'devices' share the host's cores, so "
                "weak-scaling efficiency CANNOT exceed 1/n here — this run "
                "validates sharding + methodology only; run on a real TPU "
                "slice for ICI-backed numbers")
        print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
