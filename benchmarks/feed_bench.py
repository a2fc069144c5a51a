"""Host-feed pipeline cost at production speeds (round-3 verdict weak #3).

At preset geometry (D=384/H=3) the device step is ~17.4 ms but the FULL
production fit loop measured p50 21.25 ms — ~4 ms/step the 2-vCPU host
could not hide behind the double-buffered prefetch. This harness isolates
where that goes by timing per-step wall over the same code path at several
pipeline stages:

  A. chained ``run_step`` on pre-assembled host batches (bench.py method —
     per-step device_put + dispatch in the main thread, no iterator);
  B. the REAL fit-path pipeline: ``train_batches`` iterator (assembly) ->
     ``device_prefetch`` worker thread -> step dispatch (what ``fit`` runs,
     minus logging/eval);
  C. pipeline with PRE-ASSEMBLED batches (worker only device_puts):
     separates numpy assembly GIL cost from H2D/queue cost.

Per-step wall is sampled with a periodic device fetch every ``sync`` steps
(the tunnel's async dispatch means per-step walls are meaningless without a
sync cadence; percentiles are over per-sync-window averages).

Run (TPU host): python benchmarks/feed_bench.py --embed-dim 384 --heads 3
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--embed-dim", type=int, default=384)
    ap.add_argument("--heads", type=int, default=3)
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--sync", type=int, default=20,
                    help="steps per forced device fetch")
    args = ap.parse_args()
    if args.steps < 2 * args.sync:
        ap.error(f"--steps must be >= 2*--sync ({2 * args.sync}) so at "
                 f"least one post-warm window completes")

    import jax
    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.utils.compile_cache import enable
    enable()
    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.data.loader import train_batches
    from pytorch_news_recommender_tpu.data.prefetch import device_prefetch
    from pytorch_news_recommender_tpu.train.loop import Trainer

    B = args.batch
    cfg = Config(
        data=DataConfig(dataset="synthetic"),
        model=ModelConfig(
            word_embed_size=args.embed_dim,
            num_attention_heads=args.heads, user_heads_num=args.heads,
            query_vector_dim=200, compute_dtype="bfloat16", use_pallas=True,
        ),
        train=TrainConfig(batch_size=B),
    )
    ds = synthetic.generate(cfg.data, seed=0, n_news=50000, vocab_size=45800,
                            n_train=24 * B, n_dev=8, title_len=(11.5, 3.5))
    trainer = Trainer(cfg, ds)
    rng = jax.random.PRNGKey(0)
    log(f"devices: {jax.devices()}  D={args.embed_dim} H={args.heads} B={B}")

    def force(state):
        return float(jnp.sum(
            state.params["news_encoder"]["tower"]["wqkv"][0, :2]))

    def windows(run_steps, state, n_steps):
        """Per-window (sync-cadence) average ms/step percentiles."""
        walls = []
        it = run_steps(state)
        state = next(it)            # warm (all shapes compiled by caller)
        force(state)
        t0 = time.perf_counter()
        for i, state in enumerate(it, start=2):
            if i % args.sync == 0:
                force(state)
                t1 = time.perf_counter()
                walls.append((t1 - t0) / args.sync * 1e3)
                t0 = t1
            if i >= n_steps:
                break
        walls = np.asarray(walls[1:])   # drop the first window (residual warm)
        return dict(p50=float(np.percentile(walls, 50)),
                    p90=float(np.percentile(walls, 90)),
                    mean=float(walls.mean()), n=len(walls))

    # Warm EVERY shape variant the timed loops will see: a full rng(0)
    # epoch (stages A/C replay exactly these batches) plus one rng(1)
    # epoch (stage B's first epoch reproduces it; later B epochs reshuffle
    # and could in principle mint a new bucket width mid-timing, but the
    # widths are bucket-quantized so the variant set is tiny). A partial
    # warm-up ([:8] previously) let a multi-second XLA compile land inside
    # a timed window (round-4 review finding).
    warm_batches = list(train_batches(ds.train, B, np.random.default_rng(0),
                                      dedup=True,
                                      length_split=trainer._length_split))
    warm_b1 = list(train_batches(ds.train, B, np.random.default_rng(1),
                                 dedup=True,
                                 length_split=trainer._length_split))
    state = trainer.init_state(seed=0)
    for b in warm_batches + warm_b1:
        state, _ = trainer.run_step(state, b, rng)
    force(state)
    shapes = sorted({(b["unique_ids"].shape[0] if "unique_ids" in b else -1,
                      b["short_mark"].shape[0] if "short_mark" in b else 0)
                     for b in warm_batches})
    log(f"shape variants: {shapes}")

    # ---- A: chained run_step, pre-assembled batches, main thread ----
    def run_A(state):
        i = 0
        while True:
            state, _ = trainer.run_step(state, warm_batches[i % len(warm_batches)], rng)
            i += 1
            yield state

    rA = windows(lambda s: run_A(s), state, args.steps)
    log(f"A pre-assembled chained run_step : {rA}")

    # ---- B: real fit pipeline (iterator -> prefetch thread -> step) ----
    def run_B(state):
        shuffle = np.random.default_rng(1)
        while True:
            host_iter = train_batches(ds.train, B, shuffle, dedup=True,
                                      length_split=trainer._length_split)
            for batch in device_prefetch(host_iter,
                                         trainer._batch_shardings):
                fn = trainer.train_step_fn(batch)
                state, _ = fn(state, batch, trainer.news_feats, rng)
                yield state

    state = trainer.init_state(seed=1)
    for b in warm_batches[:4]:   # shapes already compiled; settle allocator
        state, _ = trainer.run_step(state, b, rng)
    rB = windows(lambda s: run_B(s), state, args.steps)
    log(f"B production pipeline            : {rB}")

    # ---- C: prefetch thread but PRE-ASSEMBLED host batches ----
    def run_C(state):
        while True:
            def host_iter():
                for b in warm_batches:
                    yield b
            for batch in device_prefetch(host_iter(),
                                         trainer._batch_shardings):
                fn = trainer.train_step_fn(batch)
                state, _ = fn(state, batch, trainer.news_feats, rng)
                yield state

    state = trainer.init_state(seed=2)
    for b in warm_batches[:4]:   # shapes already compiled; settle allocator
        state, _ = trainer.run_step(state, b, rng)
    rC = windows(lambda s: run_C(s), state, args.steps)
    log(f"C pipeline, assembly removed     : {rC}")

    print(f"A={rA['p50']:.2f} B={rB['p50']:.2f} C={rC['p50']:.2f} ms p50 "
          f"(assembly cost ~= B-C, pipeline overhead ~= C-A)")


if __name__ == "__main__":
    main()
