"""Padding-tax sweep: MXU-aligned head/embedding geometries vs reference dims.

The roofline (docs/DESIGN.md) shows the fused encoder at ~16% of
speed-of-light, dominated by tile padding the REFERENCE dims force on every
matmul: D=300 pads to 384 lanes, and dh=300/10=30 pads to 128 on the
contraction axis of every per-head attention dot. Both taxes are
config-level, not kernel-level — this sweep measures the candidate
geometries the round-2 verdict asked for (item 4):

* ``D=384`` — same padded matmul size as 300 (zero extra MXU time), 28%
  more useful model width; GloVe-300 loads zero-padded into the wider table
  (``Trainer._apply_pretrained`` widening).
* head counts ``H=8 (dh=48) / H=6 (dh=64) / H=3 (dh=128)`` at D=384 —
  dh=128 fills the contraction lanes exactly; fewer heads also shrink the
  folded (head x subtile) batch dim the kernel pays per block.

For each geometry: full train-step time at bench dimensions (batch 512,
dedup + fused kernels, same method as bench.py), the isolated fused-encoder
fwd and fwd+bwd at the dedup width, and (``--quality``) a 3-epoch planted-
synthetic NRMS learnability check. Prints one JSON line per geometry and a
summary table to stderr.

Run on the TPU host: ``python benchmarks/padding_tax.py [--quality]``
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

GEOMETRIES = [
    # (label, D, H) — user tower follows the news tower's head count
    ("ref-D300-H10", 300, 10),
    ("D384-H8", 384, 8),
    ("D384-H6", 384, 6),
    ("D384-H3", 384, 3),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_cfg(D: int, H: int, batch: int, freeze: bool = False):
    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    return Config(
        data=DataConfig(dataset="synthetic"),
        model=ModelConfig(
            word_embed_size=D, num_attention_heads=H, user_heads_num=H,
            query_vector_dim=200, compute_dtype="bfloat16", use_pallas=True,
            freeze_word_embeddings=freeze,
        ),
        train=TrainConfig(batch_size=batch),
    )


def measure_step(trainer, ds, batch, n_lo=10, n_hi=40, reps=3):
    """Marginal ms/step, slope method (bench.py timing notes)."""
    import jax
    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.data.loader import train_batches

    batches = list(train_batches(ds.train, batch, np.random.default_rng(0),
                                 dedup=True,
                                 length_split=trainer._length_split))
    state = trainer.init_state(seed=0)
    rng = jax.random.PRNGKey(0)

    def force(state):
        leaf = jax.tree_util.tree_leaves(state.params)[0]
        return float(jnp.sum(leaf.ravel()[:2]))

    def step(state, i):
        s, _ = trainer.run_step(state, batches[i % len(batches)], rng)
        return s

    for i in range(len(batches)):
        state = step(state, i)
    force(state)
    best = {}
    for _ in range(reps):
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            for i in range(n):
                state = step(state, i)
            force(state)
            best[n] = min(best.get(n, 1e9), time.perf_counter() - t0)
    ms = (best[n_hi] - best[n_lo]) / (n_hi - n_lo) * 1e3
    if ms <= 0:
        ms = best[n_hi] / n_hi * 1e3
    return ms


def measure_encoder(D: int, H: int, M: int = 12288, L: int = 20, Q: int = 200):
    """Isolated fused encoder fwd and fwd+bwd at the dedup width (bf16)."""
    import jax
    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
        fused_news_encoder, fused_news_encoder_diff,
    )

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (M, L, D), jnp.bfloat16))(key)
    mask = jnp.ones((M, L), jnp.float32)
    p = dict(
        wqkv=jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.bfloat16),
        bqkv=jnp.asarray(rng.normal(size=(3 * D,)) * 0.01, jnp.bfloat16),
        wo=jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.bfloat16),
        bo=jnp.asarray(rng.normal(size=(D,)) * 0.01, jnp.bfloat16),
        aw=jnp.asarray(rng.normal(size=(D, Q)) * 0.05, jnp.bfloat16),
        ab=jnp.asarray(rng.normal(size=(Q,)) * 0.01, jnp.bfloat16),
        aq=jnp.asarray(rng.normal(size=(Q,)) * 0.1, jnp.bfloat16),
    )

    fwd = jax.jit(lambda x: fused_news_encoder(x, mask, **p, num_heads=H))

    def loss(x, wqkv):
        out = fused_news_encoder_diff(
            x, mask, wqkv, p["bqkv"], p["wo"], p["bo"], p["aw"], p["ab"],
            p["aq"], num_heads=H)
        return jnp.sum(out.astype(jnp.float32))

    fwdbwd = jax.jit(jax.grad(loss, argnums=1))

    out = {}
    for name, fn, arg in [("fwd", fwd, (x,)), ("fwdbwd", fwdbwd, (x, p["wqkv"]))]:
        o = fn(*arg)
        _ = np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
        times = {}
        for n in (3, 12):
            t0 = time.perf_counter()
            for _ in range(n):
                o = fn(*arg)
            _ = np.asarray(jax.tree_util.tree_leaves(o)[0].ravel()[0])
            times[n] = time.perf_counter() - t0
        ms = (times[12] - times[3]) / 9 * 1e3
        if ms <= 0:
            ms = times[12] / 12 * 1e3
        out[name] = ms
    return out


def quality_run(cfg, epochs: int = 3, seed: int = 0):
    """Planted-synthetic NRMS learnability at this geometry (same battery
    shape as benchmarks/quality_sweep.py)."""
    import dataclasses

    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.train.loop import Trainer

    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=64))
    ds = synthetic.generate(cfg.data, seed=7, n_train=2048, n_dev=192,
                            title_len=(11.5, 3.5))
    tr = Trainer(cfg, ds)
    state = tr.init_state(seed=seed)
    state, _ = tr.fit(state, num_epochs=epochs, eval_each_epoch=False)
    return tr.evaluate(state)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--quality", action="store_true",
                    help="also run the planted-synthetic check per geometry")
    ap.add_argument("--quality-epochs", type=int, default=3)
    ap.add_argument("--quality-seeds", type=int, default=1,
                    help="average the planted check over this many init "
                         "seeds (decision-grade quality comparison)")
    ap.add_argument("--skip-step", action="store_true",
                    help="no full train step measurement")
    ap.add_argument("--skip-encoder", action="store_true",
                    help="no isolated encoder-kernel measurement")
    ap.add_argument("--geos", nargs="*", default=None,
                    help="subset of geometry labels")
    ap.add_argument("--freeze", action="store_true",
                    help="freeze the word table "
                         "(from_pretrained(freeze=True) parity mode) — "
                         "removes the scatter-add backward entirely")
    args = ap.parse_args()

    import jax

    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.train.loop import Trainer
    from pytorch_news_recommender_tpu.utils.compile_cache import enable
    enable()
    log(f"devices: {jax.devices()}")

    rows = []
    for label, D, H in GEOMETRIES:
        if args.geos and label not in args.geos:
            continue
        cfg = make_cfg(D, H, args.batch, freeze=args.freeze)
        rec = {"geometry": label, "D": D, "H": H, "dh": D // H,
               "freeze": bool(args.freeze)}
        if not args.skip_encoder:
            t0 = time.perf_counter()
            enc = measure_encoder(D, H)
            rec["enc_fwd_ms"] = round(enc["fwd"], 2)
            rec["enc_fwdbwd_ms"] = round(enc["fwdbwd"], 2)
            log(f"{label}: encoder fwd {enc['fwd']:.2f} ms, fwd+bwd "
                f"{enc['fwdbwd']:.2f} ms ({time.perf_counter()-t0:.0f}s)")
        if not args.skip_step:
            ds = synthetic.generate(cfg.data, seed=0, n_news=50000,
                                    vocab_size=45800,
                                    n_train=8 * args.batch, n_dev=8,
                                    title_len=(11.5, 3.5))
            trainer = Trainer(cfg, ds)
            t0 = time.perf_counter()
            ms = measure_step(trainer, ds, args.batch)
            rec["step_ms"] = round(ms, 2)
            rec["examples_per_sec"] = round(args.batch / ms * 1e3, 0)
            log(f"{label}: step {ms:.2f} ms -> {args.batch/ms*1e3:,.0f} ex/s "
                f"({time.perf_counter()-t0:.0f}s)")
        if args.quality:
            t0 = time.perf_counter()
            aucs, ndcgs = [], []
            for s in range(args.quality_seeds):
                m = quality_run(cfg, epochs=args.quality_epochs, seed=s)
                aucs.append(float(m["auc"]))
                ndcgs.append(float(m["ndcg@10"]))
            E = args.quality_epochs
            rec[f"auc_{E}ep"] = round(float(np.mean(aucs)), 4)
            rec[f"auc_{E}ep_seeds"] = [round(a, 4) for a in aucs]
            rec[f"ndcg10_{E}ep"] = round(float(np.mean(ndcgs)), 4)
            log(f"{label}: planted AUC@{E}ep {rec[f'auc_{E}ep']} "
                f"(seeds {rec[f'auc_{E}ep_seeds']}, "
                f"{time.perf_counter()-t0:.0f}s)")
        print(json.dumps(rec), flush=True)
        rows.append(rec)

    if rows:
        base = rows[0]
        log("\ngeometry         enc_fwdbwd   step     vs ref")
        for r in rows:
            rel = (base.get("step_ms", 0) / r["step_ms"]
                   if r.get("step_ms") else float("nan"))
            log(f"{r['geometry']:<16} "
                f"{r.get('enc_fwdbwd_ms', float('nan')):>8.2f} ms "
                f"{r.get('step_ms', float('nan')):>7.2f} ms  {rel:>5.2f}x")


if __name__ == "__main__":
    main()
