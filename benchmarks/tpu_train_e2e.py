"""End-to-end training run on the attached accelerator at MIND scale.

Exercises the WHOLE loop on hardware — fit (jitted donated steps, device
prefetch), periodic two-tower eval, best-AUC checkpointing — on the
planted-structure synthetic dataset at reference dimensions (50k news, vocab
45,800, GloVe-300 dims, batch 512). This is the hardware counterpart of the
CPU quality sweep: AUC must clear ~0.8 on planted data, and the epoch
wall-clock validates the step-rate numbers from bench.py end to end.

Run: python benchmarks/tpu_train_e2e.py [--epochs 2] [--n-train 65536]
Prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--n-train", type=int, default=65536)
    ap.add_argument("--n-dev", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax

    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.train.loop import Trainer
    from pytorch_news_recommender_tpu.utils.compile_cache import enable

    enable()
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    cfg = Config(
        data=DataConfig(dataset="synthetic"),
        model=ModelConfig(
            word_embed_size=300, num_attention_heads=10, user_heads_num=10,
            query_vector_dim=200, compute_dtype="bfloat16", use_pallas=True,
        ),
        train=TrainConfig(batch_size=args.batch, eval_batch_size=256,
                          eval_step=0, learning_rate=1e-3,
                          auc_checkpoint_floor=0.56),
    )
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

    ckpts = []
    history_log = []
    t0 = time.perf_counter()
    state, history = trainer.fit(
        state, num_epochs=args.epochs,
        log_fn=history_log.append,
        checkpoint_cb=lambda s, m, step: ckpts.append((step, m["auc"])),
    )
    t_fit = time.perf_counter() - t0

    t0 = time.perf_counter()
    after = trainer.evaluate(state)
    t_eval = time.perf_counter() - t0

    steps = args.epochs * (args.n_train // args.batch)
    out = {
        "auc_before": round(before["auc"], 4),
        "auc_after": round(after["auc"], 4),
        "ndcg10_after": round(after["ndcg@10"], 4),
        "epochs": args.epochs,
        "steps": steps,
        "fit_wall_s": round(t_fit, 1),
        "examples_per_sec_incl_evals": round(steps * args.batch / t_fit, 1),
        "eval_wall_s": round(t_eval, 1),
        "n_checkpoint_improvements": len(ckpts),
    }
    print(json.dumps(out), flush=True)
    assert after["auc"] > 0.75, out


if __name__ == "__main__":
    main()
