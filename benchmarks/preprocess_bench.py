"""Offline-preprocessing throughput: raw MIND TSVs -> columnar artifacts.

The reference's L1 layer is minutes of pandas + pure-Python row loops over
``behaviors.tsv`` chunks in a multiprocessing pool (``data_processor.py:
493-541``) plus per-news NLTK tokenization (``:141-222``). This framework
preprocesses with vectorized numpy + a native C++ fast path
(``native/mind_native.cpp``: behavior-log sampling, tokenization to word
ids) that is bit-identical to the Python fallback (tests/test_native.py).

This bench synthesizes MIND-format TSVs at a requested scale (real MIND-large
is ~2.2M train behaviors, 101k news) and times the FULL ``mind.build_dataset``
job — news union, vocab, id matrices, negative-sampled train groups, ragged
dev split, dicts — once with the native path and once pure-Python.

Run: python benchmarks/preprocess_bench.py [--rows 200000] [--news 60000]
Prints one JSON line with rows/sec for both paths.
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


def log(*a):
    print(*a, file=sys.stderr, flush=True)


WORDS = None


def _words(rng, vocab_size=40000):
    global WORDS
    if WORDS is None:
        # Zipf-ish word pool; a few thousand distinct strings is enough to
        # exercise the vocab/threshold machinery
        lens = rng.integers(3, 10, size=vocab_size)
        letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
        WORDS = np.array(["".join(rng.choice(letters, size=l)) + (
            str(i % 100) if i % 7 == 0 else "")  # some alphanumerics
            for i, l in enumerate(lens)])
    return WORDS


def synth_news_tsv(path, n_news, rng):
    words = _words(rng)
    zipf = 1.0 / np.arange(1, len(words) + 1) ** 0.9
    zipf /= zipf.sum()
    cats = [f"cat{i}" for i in range(18)]
    subcats = [f"sub{i}" for i in range(280)]
    with open(path, "w") as f:
        for i in range(n_news):
            t = " ".join(rng.choice(words, size=rng.integers(4, 16), p=zipf))
            a = " ".join(rng.choice(words, size=rng.integers(8, 40), p=zipf))
            f.write(f"N{i+1}\t{rng.choice(cats)}\t{rng.choice(subcats)}\t"
                    f"{t}\t{a}\tu\t\t\n")


def synth_behaviors_tsv(path, n_rows, n_news, n_users, rng):
    with open(path, "w") as f:
        for i in range(n_rows):
            hist_n = int(rng.integers(3, 51))
            hist = " ".join(f"N{j}" for j in
                            rng.integers(1, n_news + 1, size=hist_n))
            n_cand = int(rng.integers(8, 40))
            labels = np.zeros(n_cand, np.int64)
            labels[rng.integers(0, n_cand, size=max(1, n_cand // 12))] = 1
            imps = " ".join(
                f"N{j}-{l}" for j, l in
                zip(rng.integers(1, n_news + 1, size=n_cand), labels))
            f.write(f"{i+1}\tU{int(rng.integers(1, n_users))}\t"
                    f"11/11/2019 9:05:58 AM\t{hist}\t{imps}\n")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000,
                    help="train behaviors rows (MIND-large is ~2.2M)")
    ap.add_argument("--news", type=int, default=60_000)
    ap.add_argument("--dev-rows", type=int, default=None,
                    help="default rows//6 (MIND ratio)")
    ap.add_argument("--skip-python", action="store_true",
                    help="only time the native path")
    args = ap.parse_args()
    dev_rows = args.dev_rows if args.dev_rows is not None else args.rows // 6

    from pytorch_news_recommender_tpu import native
    from pytorch_news_recommender_tpu.config import DataConfig
    from pytorch_news_recommender_tpu.data import mind

    rng = np.random.default_rng(0)
    tmp = pathlib.Path(tempfile.mkdtemp(prefix="pp_bench_"))
    (tmp / "train").mkdir()
    (tmp / "dev").mkdir()
    t0 = time.perf_counter()
    synth_news_tsv(tmp / "train" / "news.tsv", args.news, rng)
    synth_news_tsv(tmp / "dev" / "news.tsv", args.news // 10, rng)
    synth_behaviors_tsv(tmp / "train" / "behaviors.tsv", args.rows,
                        args.news, args.rows // 20 + 2, rng)
    synth_behaviors_tsv(tmp / "dev" / "behaviors.tsv", dev_rows,
                        args.news, args.rows // 20 + 2, rng)
    log(f"synthesized TSVs in {time.perf_counter()-t0:.1f}s "
        f"({args.rows} train rows, {args.news} news) at {tmp}")

    cfg = DataConfig()
    out = {"metric": "preprocess_rows_per_sec", "unit": "behaviors rows/sec",
           "train_rows": args.rows, "dev_rows": dev_rows,
           "n_news": args.news, "native_available": native.available()}

    def run(use_native):
        t0 = time.perf_counter()
        ds = mind.build_dataset(cfg, tmp / "train", tmp / "dev",
                                use_native=use_native)
        dt = time.perf_counter() - t0
        return dt, ds

    if native.available():
        dt, ds_n = run(True)
        out["native_wall_s"] = round(dt, 2)
        out["value"] = round((args.rows + dev_rows) / dt, 1)
        out["n_train_samples"] = len(ds_n.train)
        log(f"native path: {dt:.2f}s  "
            f"({(args.rows + dev_rows)/dt:,.0f} rows/s)")
    if not args.skip_python:
        dt_p, ds_p = run(False)
        out["python_wall_s"] = round(dt_p, 2)
        out["python_rows_per_sec"] = round((args.rows + dev_rows) / dt_p, 1)
        log(f"python path: {dt_p:.2f}s  "
            f"({(args.rows + dev_rows)/dt_p:,.0f} rows/s)")
        if native.available():
            out["native_speedup"] = round(dt_p / out["native_wall_s"], 2)
            # bit-identical check on the expensive artifacts
            np.testing.assert_array_equal(ds_n.train.browsed_ids,
                                          ds_p.train.browsed_ids)
            np.testing.assert_array_equal(ds_n.train.candidate_ids,
                                          ds_p.train.candidate_ids)
            np.testing.assert_array_equal(ds_n.news.title, ds_p.news.title)
            out["bit_identical"] = True
        else:
            out["value"] = out["python_rows_per_sec"]

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
