"""Adressa end-to-end learnability battery (round-3 verdict item 8).

BASELINE.json config 5 names "GNN on MIND-large + Adressa"; the Adressa
pipeline (``data/adressa.py`` — the reference names the dataset in
``README.md:3`` but ships no code) has pipeline tests but needed
learnability evidence. This battery synthesizes a PLANTED-structure Adressa
one-week-style event log (users hold a topic preference; titles draw words
from per-topic pools; ``category1`` carries the topic), builds the dataset
through the real ``adressa.build_dataset`` (chronological split, sampled
negatives, co-click graph for GNN), trains the requested families, and
reports dev AUC per family. A family that learns the planted structure must
clearly beat chance on the chronological dev tail.

Run: python benchmarks/adressa_quality.py [--families nrms gnn lstur]
     [--epochs 3] [--events 60000] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

TOPICS = ["nyheter", "sport", "okonomi", "kultur", "teknologi", "reise"]
WORDS_PER_TOPIC = 40
SHARED_WORDS = 30


def _letter_word(prefix: str, i: int) -> str:
    """Digit-free token: MIND tokenization STRIPS digits
    (``data_processor.py:151-156`` semantics, reproduced in data/mind.py),
    so numeric suffixes would collapse every planted word onto one token
    and erase the signal."""
    letters = "abcdefghijklmnopqrstuvwxyz"
    return prefix + letters[i // 26] + letters[i % 26]


def synth_events(path: pathlib.Path, n_events: int, n_news: int,
                 n_users: int, seed: int = 0, on_topic: float = 0.85):
    """Planted-topic Adressa-style JSONL: each article belongs to a topic and
    draws title words from that topic's pool; each user clicks their
    preferred topic with prob ``on_topic``."""
    rng = np.random.default_rng(seed)
    topic_of_news = rng.integers(0, len(TOPICS), size=n_news)
    word_pools = [[_letter_word(TOPICS[t][:4], i)
                   for i in range(WORDS_PER_TOPIC)]
                  for t in range(len(TOPICS))]
    shared = [_letter_word("felles", i) for i in range(SHARED_WORDS)]
    titles = []
    for i in range(n_news):
        pool = word_pools[topic_of_news[i]]
        k = int(rng.integers(6, 13))
        words = [pool[int(j)] for j in rng.integers(0, len(pool), size=k)]
        words += [shared[int(j)] for j in rng.integers(0, len(shared), size=3)]
        titles.append(" ".join(words))
    user_topic = rng.integers(0, len(TOPICS), size=n_users)
    # per-topic article lists for fast sampling
    by_topic = [np.where(topic_of_news == t)[0] for t in range(len(TOPICS))]

    lines = []
    t = 1_500_000_000
    for _ in range(n_events):
        u = int(rng.integers(0, n_users))
        if rng.random() < on_topic:
            pool = by_topic[user_topic[u]]
        else:
            pool = np.arange(n_news)
        a = int(pool[int(rng.integers(0, len(pool)))])
        sub = "hoved" if a % 2 else "lokal"
        lines.append(json.dumps({
            "uid": f"u{u}", "id": f"art{a}", "title": titles[a],
            "category1": f"{TOPICS[topic_of_news[a]]}|{sub}", "time": t}))
        t += int(rng.integers(1, 8))
    path.write_text("\n".join(lines) + "\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*", default=["nrms", "gnn", "lstur"])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--events", type=int, default=60000)
    ap.add_argument("--news", type=int, default=1200)
    ap.add_argument("--users", type=int, default=400)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="/tmp/adressa_quality.json")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, apply_family_defaults,
    )
    from pytorch_news_recommender_tpu.data import adressa
    from pytorch_news_recommender_tpu.train.loop import Trainer
    from pytorch_news_recommender_tpu.utils.compile_cache import enable
    enable()

    import tempfile
    with tempfile.TemporaryDirectory() as td:
        events = pathlib.Path(td) / "events.jsonl"
        t0 = time.time()
        synth_events(events, args.events, args.news, args.users)
        dcfg = DataConfig(dataset="adressa", history_len=30, sample_size=4,
                          min_history=5)
        ds = adressa.build_dataset(dcfg, [events], dev_negatives=20,
                                   news_graph_neighbors=10)
        print(f"built: {ds.meta.n_news} news, {len(ds.train)} train, "
              f"{len(ds.dev)} dev impressions ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)

        results = {}
        for name in args.families:
            cfg = Config(data=dcfg)
            d = cfg.to_dict()
            d["model"]["name"] = name
            d["model"]["use_pallas"] = not args.cpu
            d["train"]["batch_size"] = 64
            d["train"]["eval_batch_size"] = 64
            apply_family_defaults(d)  # shipped per-family hparams (npa lr)
            cfg = Config.from_dict(d)
            t0 = time.time()
            tr = Trainer(cfg, ds)
            state, _ = tr.fit(num_epochs=args.epochs, eval_each_epoch=False)
            m = tr.evaluate(state)
            m["train_s"] = round(time.time() - t0, 1)
            results[name] = {k: round(float(v), 4) for k, v in m.items()}
            print(json.dumps({"family": name, **results[name]}), flush=True)

        pathlib.Path(args.out).write_text(json.dumps(results, indent=1))
        worst = min(v["auc"] for v in results.values())
        print(f"worst family AUC: {worst}", file=sys.stderr)


if __name__ == "__main__":
    main()
