"""Compare the two hand-scheduled sharded-embedding lookup schedules.

Times `sharded_embedding_lookup` (local gather + psum of dense partials)
against `sharded_embedding_lookup_a2a` (MoE-style request/response
all-to-all) and the jit/auto baseline (XLA chooses; typically all-gathers
the table) at MIND dimensions, over a data x model mesh.

On the CPU virtual mesh this measures schedule overhead only — collective
cost there is memcpy, not ICI. The numbers that matter come from running
this unchanged on a real multi-chip slice; the analytic traffic model is:

  psum variant:  each link carries the dense [n_ids, D] partial  (n_ids*D)
  a2a variant:   request ids n_ids/n_model + response rows
                 n_ids*D/n_model per link, plus the final all_gather
                 n_ids*D*(n-1)/n — wins when the model axis is wide or
                 when downstream consumes the *sharded* rows directly
  auto (gather): one all-gather of the table shard (V*D*(n-1)/n) — wins
                 when the table is smaller than the id stream (MIND's
                 45.8k x 300 word table: usually this)

Run: python benchmarks/sharded_lookup_bench.py [--ids 245760] [--mp 2]
     (CPU: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8)

``--in-situ`` additionally times a FULL dedup NRMS train step per schedule
(``ModelConfig.embedding_lookup = auto|psum|a2a`` through the real Trainer) —
the lookup as it runs in training, not in isolation.
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ids", type=int, default=245760)  # 12288 news x 20 words
    ap.add_argument("--mp", type=int, default=2)
    ap.add_argument("--vocab", type=int, default=45800)
    ap.add_argument("--dim", type=int, default=300)
    ap.add_argument("--in-situ", action="store_true", dest="in_situ",
                    help="also time a full dedup train step per schedule")
    ap.add_argument("--batch", type=int, default=64,
                    help="train batch size for --in-situ")
    args = ap.parse_args()

    import os

    import jax

    # the hosted axon plugin overrides JAX_PLATFORMS=cpu from the
    # environment; pin via config before backend init (see conftest.py)
    if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pytorch_news_recommender_tpu.config import MeshConfig
    from pytorch_news_recommender_tpu.parallel.mesh import make_mesh
    from pytorch_news_recommender_tpu.parallel.sharded_embedding import (
        sharded_embedding_lookup, sharded_embedding_lookup_a2a,
    )

    mesh = make_mesh(MeshConfig(model_parallel_size=args.mp))
    n_model = mesh.shape["model"]
    V = args.vocab - args.vocab % n_model  # even shards
    D = args.dim

    rng = np.random.default_rng(0)
    table = jax.device_put(
        jnp.asarray(rng.standard_normal((V, D)), jnp.float32),
        NamedSharding(mesh, P("model", None)))
    ids = jax.device_put(
        jnp.asarray(rng.integers(0, V, size=(args.ids,)), jnp.int32),
        NamedSharding(mesh, P("data")))

    def timeit(fn, *a, n=20):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / n * 1e3

    auto = jax.jit(lambda t, i: jnp.take(t, i, axis=0))
    psum = jax.jit(lambda t, i: sharded_embedding_lookup(t, i, mesh))
    a2a = jax.jit(lambda t, i: sharded_embedding_lookup_a2a(
        t, i, mesh, capacity_factor=2.0))

    out_ref = np.asarray(auto(table, ids))
    out_p = np.asarray(psum(table, ids))
    out_a, dropped = a2a(table, ids)
    np.testing.assert_allclose(out_p, out_ref, rtol=1e-6)
    assert int(dropped) == 0, int(dropped)
    np.testing.assert_allclose(np.asarray(out_a), out_ref, rtol=1e-6)

    print(f"mesh {dict(mesh.shape)}  ids {args.ids}  table {V}x{D}")
    print(f"auto (jit take, XLA collectives): {timeit(auto, table, ids):8.2f} ms")
    print(f"psum local-gather schedule:       {timeit(psum, table, ids):8.2f} ms")
    print(f"a2a dispatch schedule:            {timeit(a2a, table, ids):8.2f} ms")

    if args.in_situ:
        in_situ(mesh, args)


def in_situ(mesh, args):
    """Full dedup NRMS train step per embedding_lookup schedule."""
    import dataclasses
    import time

    import jax

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.data.loader import train_batches
    from pytorch_news_recommender_tpu.train.loop import Trainer

    base = synthetic_config()
    ds = synthetic.generate(base.data, seed=0, n_news=4096,
                            vocab_size=args.vocab, n_train=4 * args.batch,
                            n_dev=8)
    batch = next(train_batches(ds.train, args.batch,
                               np.random.default_rng(0), dedup=True))
    print(f"\nin-situ dedup train step (batch {args.batch}):")
    losses = {}
    for sched in ("auto", "psum", "a2a"):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model,
                                            embedding_lookup=sched))
        tr = Trainer(cfg, ds, mesh=mesh)
        state = tr.init_state(seed=0)
        rng = jax.random.PRNGKey(0)
        state, m = tr.run_step(state, batch, rng)   # compile
        losses[sched] = float(m["loss"])
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            state, m = tr.run_step(state, batch, rng)
        float(m["loss"])
        ms = (time.perf_counter() - t0) / n * 1e3
        print(f"  {sched:<5} {ms:8.2f} ms/step   first-step loss "
              f"{losses[sched]:.5f}")
    spread = max(losses.values()) - min(losses.values())
    assert spread < 1e-5, f"schedules disagree: {losses}"
    print(f"  schedules agree (loss spread {spread:.2e})")


if __name__ == "__main__":
    main()
