"""End-to-end training run on the attached accelerator at MIND scale.

Exercises the WHOLE loop on hardware — fit (jitted donated steps, device
prefetch), periodic two-tower eval, REAL Orbax best-AUC checkpoint retention
(save on improvement, max_to_keep pruning, best-step restore) — on the
planted-structure synthetic dataset at reference dimensions (50k news, vocab
45,800, GloVe-300 dims, batch 512, MIND-like variable title lengths so the
dedup widths and length-split short widths churn across batches). This is
the hardware counterpart of the CPU quality sweep and the closest available
proxy to the blocked MIND-parity run: AUC must clear ~0.8 on planted data,
the AUC trajectory is reported at every eval point, and per-step wall times
validate bench.py's marginal rate end to end (p50/p95 step stability).

Run: python benchmarks/tpu_train_e2e.py [--epochs 2] [--n-train 131072]
Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n-train", type=int, default=131072)
    ap.add_argument("--n-dev", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--eval-step", type=int, default=64,
                    help="eval every N steps (0 = epoch ends only)")
    ap.add_argument("--ckpt-dir", default=None,
                    help="Orbax checkpoint dir (default: temp dir)")
    ap.add_argument("--embed-dim", type=int, default=300,
                    help="384 = MXU-aligned preset (DESIGN.md geometry)")
    ap.add_argument("--heads", type=int, default=10)
    ap.add_argument("--model", default="nrms",
                    help="model family (shipped FAMILY_TRAIN_DEFAULTS "
                         "apply, e.g. fastformer lr)")
    args = ap.parse_args()

    import jax

    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.train.checkpoint import CheckpointManager
    from pytorch_news_recommender_tpu.train.loop import Trainer
    from pytorch_news_recommender_tpu.utils.compile_cache import enable

    enable()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    from pytorch_news_recommender_tpu.config import apply_family_defaults
    cfg = Config(
        data=DataConfig(dataset="synthetic"),
        model=ModelConfig(
            name=args.model, word_embed_size=args.embed_dim,
            num_attention_heads=args.heads, user_heads_num=args.heads,
            query_vector_dim=200, compute_dtype="bfloat16", use_pallas=True,
        ),
        train=TrainConfig(batch_size=args.batch, eval_batch_size=256,
                          eval_step=args.eval_step, log_every=16,
                          learning_rate=1e-3, auc_checkpoint_floor=0.56),
    )
    cfg = Config.from_dict(apply_family_defaults(cfg.to_dict()))
    ds = synthetic.generate(cfg.data, seed=0, n_news=50000, vocab_size=45800,
                            n_train=args.n_train, n_dev=args.n_dev,
                            title_len=(11.5, 3.5))
    trainer = Trainer(cfg, ds)
    state = trainer.init_state(seed=0)

    t0 = time.perf_counter()
    before = trainer.evaluate(state)
    t_eval0 = time.perf_counter() - t0
    print(f"eval before training: auc={before['auc']:.3f} "
          f"({t_eval0:.1f}s incl. compile)", file=sys.stderr, flush=True)

    ckpt_dir = args.ckpt_dir or tempfile.mkdtemp(prefix="e2e_ckpt_")
    mngr = CheckpointManager(ckpt_dir, cfg, max_to_keep=3)
    saved = []

    def on_improve(s, m, step):
        mngr.save(step, s, m)
        saved.append((step, round(m["auc"], 4)))
        print(f"  ckpt @{step}: auc={m['auc']:.4f}", file=sys.stderr,
              flush=True)

    history_log = []
    t0 = time.perf_counter()
    state, history = trainer.fit(
        state, num_epochs=args.epochs,
        log_fn=history_log.append,
        checkpoint_cb=on_improve,
    )
    t_fit = time.perf_counter() - t0

    t0 = time.perf_counter()
    after = trainer.evaluate(state)
    t_eval = time.perf_counter() - t0

    # AUC trajectory from every eval point the fit loop hit
    trajectory = [(h["step"], round(h["auc"], 4))
                  for h in history if "auc" in h]

    # Step-time stability from the periodic loss logs: marginal ms/step
    # between consecutive log lines WITHIN an epoch segment (eval points
    # and compiles sit between segments and are excluded by the p50/p95).
    step_logs = [h for h in history_log if "elapsed_s" in h]
    step_ms = []
    for a, b in zip(step_logs, step_logs[1:]):
        dsteps = b["step"] - a["step"]
        if dsteps > 0:
            step_ms.append((b["elapsed_s"] - a["elapsed_s"]) / dsteps * 1e3)
    step_ms = np.asarray(step_ms) if step_ms else np.asarray([0.0])

    # checkpoint retention + exact best-step restore round-trip
    assert mngr.best_step() == max(saved, key=lambda t: t[1])[0], (
        mngr.best_step(), saved)
    kept = sorted(int(p.name) for p in pathlib.Path(ckpt_dir).iterdir()
                  if p.name.isdigit())
    restored = mngr.restore(trainer.init_state(seed=1))
    m_best = trainer.evaluate(restored)
    mngr.close()

    steps = args.epochs * (args.n_train // args.batch)
    out = {
        "auc_before": round(before["auc"], 4),
        "auc_after": round(after["auc"], 4),
        "ndcg10_after": round(after["ndcg@10"], 4),
        "auc_trajectory": trajectory,
        "epochs": args.epochs,
        "steps": steps,
        "fit_wall_s": round(t_fit, 1),
        "examples_per_sec_incl_evals": round(steps * args.batch / t_fit, 1),
        "step_ms_p50": round(float(np.percentile(step_ms, 50)), 2),
        "step_ms_p95": round(float(np.percentile(step_ms, 95)), 2),
        "eval_wall_s": round(t_eval, 1),
        "n_checkpoint_improvements": len(saved),
        "ckpts_kept": kept,
        "best_ckpt_auc_on_restore": round(m_best["auc"], 4),
    }
    print(json.dumps(out), flush=True)
    assert after["auc"] > 0.75, out
    assert len(kept) <= 3, kept
    assert m_best["auc"] >= max(a for _, a in saved) - 1e-3, (m_best, saved)


if __name__ == "__main__":
    main()
