"""Learnability sweep: every registered family trained briefly on the planted
synthetic dataset; reports per-family dev metrics.

Not a benchmark of speed — a correctness/capacity check that each family's
towers, scoring head, and (where applicable) aux losses actually learn the
planted topical structure. Writes one JSON line per family and a summary
file.

Run: python benchmarks/quality_sweep.py [--epochs 3] [--out sweep.json]
(CPU-friendly; forces the cpu backend.)
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--families", nargs="*", default=None)
    ap.add_argument("--out", default="/tmp/quality_sweep.json")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")


    from pytorch_news_recommender_tpu import models as M
    from pytorch_news_recommender_tpu.config import (
        Config, apply_family_defaults, synthetic_config,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.train.loop import Trainer

    base = synthetic_config()
    ds = synthetic.generate(base.data, seed=7, n_train=2048, n_dev=192,
                            bert_dim=64, n_users=100, n_neighbors=8,
                            n_entities=32, entity_dim=16,
                            title_len=(11.5, 3.5))

    families = args.families or M.available_models()
    results = {}
    for name in families:
        d = base.to_dict()
        d["model"]["name"] = name
        d["train"]["batch_size"] = 64
        apply_family_defaults(d)  # shipped per-family hparams (e.g. npa lr)
        cfg = Config.from_dict(d)
        t0 = time.time()
        try:
            trainer = Trainer(cfg, ds)
            state, _ = trainer.fit(num_epochs=args.epochs,
                                   eval_each_epoch=False)
            m = trainer.evaluate(state)
            m["train_s"] = round(time.time() - t0, 1)
            results[name] = {k: round(float(v), 4) for k, v in m.items()}
        except Exception as e:  # keep sweeping
            results[name] = {"error": f"{type(e).__name__}: {e}"[:300]}
        print(json.dumps({"family": name, **results[name]}), flush=True)

    pathlib.Path(args.out).write_text(json.dumps(results, indent=2))
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
