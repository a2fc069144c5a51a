"""Command-line entry point.

Replaces the reference's ``run_v0.py`` / ``run_demo.py`` argparse mains
(``MIND_2020/run_v0.py:15-112``) with subcommands over the same lifecycle:

* ``preprocess`` — MIND TSVs -> columnar artifacts (reference
  ``data_processor.py`` ``__main__``);
* ``train``      — train + periodic dev eval + best-AUC checkpointing
  (reference ``train(...)``, ``train_eval.py:35-153``);
* ``eval``       — impression-level AUC/MRR/nDCG@5/10 on a split from a
  checkpoint (reference ``evaluate``, ``train_eval.py:229-273``);
* ``submit``     — test-set rank file (reference ``test``,
  ``train_eval.py:300-341``);
* ``models``     — list the registry (reference's dynamic import had no
  listing, ``model/__init__.py:22``).

Flag parity notes: ``--model``/``--dataset``/``--load``/``--description``
mirror ``run_v0.py:15-28``. The reference forces ``sample_size=15`` for the
listwise re-ranker (``run_v0.py:44-45``) — ``train`` applies the same default
for ``list_rank`` unless ``--sample-size`` is given. ``--n_GPUs`` has no
analogue: parallelism is the device mesh (``--model-parallel``).

Usage: ``python -m pytorch_news_recommender_tpu.cli <command> ...``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import pathlib
import sys


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data", required=True,
                   help="artifact dir from `preprocess`, or 'synthetic'")
    p.add_argument("--model", default="nrms",
                   help="model family (see `models` command)")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--eval-batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=None,
                   help="Adam learning rate (default 1e-3 = reference "
                        "run_v0.py; npa defaults to its swept 2e-2 — "
                        "see FAMILY_TRAIN_DEFAULTS)")
    p.add_argument("--no-pallas", action="store_true",
                   help="disable fused Pallas kernels (pure-XLA path)")
    p.add_argument("--compute-dtype", default=None,
                   help="bfloat16 (default on TPU) or float32")
    p.add_argument("--model-parallel", type=int, default=1,
                   help="model-axis size of the device mesh")
    p.add_argument("--embed-dim", type=int, default=None,
                   help="word embedding dim D (default 300 = reference "
                        "parity; 384 = MXU-aligned, GloVe loads zero-padded "
                        "— see docs/DESIGN.md geometry table)")
    p.add_argument("--heads", type=int, default=None,
                   help="news/user attention heads H (default 10 = "
                        "reference; 6 or 3 at --embed-dim 384 cut the "
                        "dh->128 contraction padding: +26%% / +42%% step "
                        "throughput measured)")


def _load_dataset(args, cfg):
    if args.data == "synthetic":
        from pytorch_news_recommender_tpu.data import synthetic
        return synthetic.generate(cfg.data, seed=0, bert_dim=64, n_users=200,
                                  n_neighbors=8, n_test=64)
    from pytorch_news_recommender_tpu.data.dataset import RecDataset
    return RecDataset.load(args.data)


def _build_config(args, sample_size=None):
    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, synthetic_config,
    )
    if args.data == "synthetic":
        cfg = synthetic_config()
        d = cfg.to_dict()
    else:
        d = Config().to_dict()
    d["model"]["name"] = args.model
    from pytorch_news_recommender_tpu.config import apply_family_defaults
    # `is not None`, not truthiness: --lr 0.0 is an explicit user value and
    # must win over family defaults (review finding r4).
    lr = getattr(args, "lr", None)
    apply_family_defaults(d, {"learning_rate"} if lr is not None else set())
    if lr is not None:
        d["train"]["learning_rate"] = lr
    if args.no_pallas:
        d["model"]["use_pallas"] = False
    if args.compute_dtype:
        d["model"]["compute_dtype"] = args.compute_dtype
    # `is not None` + explicit positivity, matching the --lr handling: a
    # falsy 0 must be rejected loudly, not silently ignored (advisor r4).
    for flag, attr in (("--embed-dim", "embed_dim"), ("--heads", "heads"),
                       ("--batch-size", "batch_size"),
                       ("--eval-batch-size", "eval_batch_size")):
        v = getattr(args, attr, None)
        if v is not None and v <= 0:
            raise SystemExit(f"error: {flag} must be a positive integer, "
                             f"got {v}")
    if getattr(args, "embed_dim", None) is not None:
        d["model"]["word_embed_size"] = args.embed_dim
    if getattr(args, "heads", None) is not None:
        d["model"]["num_attention_heads"] = args.heads
        d["model"]["user_heads_num"] = args.heads
    # Validate here, where the flags live: the downstream failure is a bare
    # divisibility assert deep in the MHSA module (models/layers.py:128),
    # opaque and stripped under python -O.
    dd, hh = d["model"]["word_embed_size"], d["model"]["num_attention_heads"]
    if dd % hh != 0:
        raise SystemExit(
            f"error: word embedding dim D={dd} is not divisible by attention "
            f"heads H={hh}; pass a compatible --heads with --embed-dim "
            f"(e.g. --embed-dim 384 --heads 6 or --heads 3)")
    if args.batch_size is not None:
        d["train"]["batch_size"] = args.batch_size
    if args.eval_batch_size is not None:
        d["train"]["eval_batch_size"] = args.eval_batch_size
    d["mesh"]["model_parallel_size"] = args.model_parallel
    if sample_size is not None:
        d["data"]["sample_size"] = sample_size
    if getattr(args, "description", None):
        d["description"] = args.description
    if getattr(args, "debug_nans", False):
        d["train"]["debug_nans"] = True
    if getattr(args, "skip_nonfinite", False):
        d["train"]["skip_nonfinite_updates"] = True
    return Config.from_dict(d)


def cmd_preprocess(args) -> int:
    from pytorch_news_recommender_tpu.config import DataConfig
    from pytorch_news_recommender_tpu.data import mind

    cfg = DataConfig(
        history_len=args.history_len, sample_size=args.sample_size,
        min_history=args.min_history, entity_nums=args.entity_nums,
        word_freq_threshold=args.word_freq_threshold,
    )
    ds = mind.build_dataset(
        cfg,
        train_dir=args.train_dir,
        dev_dir=args.dev_dir,
        test_dir=args.test_dir,
        glove_path=args.glove,
        word_embed_size=args.word_embed_size,
        bert_npz=args.bert_npz,
        news_graph_neighbors=args.graph_neighbors,
        seed=args.seed,
        out_dir=args.out,
    )
    print(f"wrote artifacts to {args.out}: {ds.meta.to_json()}")
    return 0


def cmd_stats(args) -> int:
    """Dataset statistics over built artifacts — the working replacement for
    the reference's ad-hoc ``_count_news_ids`` prints
    (``data_processor.py:417-449``): split sizes, distinct news per split,
    dev cold-start fraction, history/candidate distributions."""
    import json

    import numpy as np

    from pytorch_news_recommender_tpu.data.dataset import RecDataset

    ds = RecDataset.load(args.artifacts)
    out = {"n_news": int(ds.news.n_news) - 1,
           "vocab_words": int(ds.meta.n_words)}

    train_news = set()
    if ds.train is not None:
        t = ds.train
        train_news = set(np.unique(t.candidate_ids)) | set(
            np.unique(t.browsed_ids))
        train_news.discard(0)
        hist_len = (t.browsed_ids != 0).sum(axis=1)
        out["train"] = {
            "impressions": len(t),
            "distinct_news": len(train_news),
            "history_len_mean": round(float(hist_len.mean()), 2),
            "history_len_p50": int(np.percentile(hist_len, 50)),
            "group_size": int(t.candidate_ids.shape[1]),
        }
    for name in ("dev", "test"):
        split = getattr(ds, name)
        if split is None:
            continue
        snews = set(np.unique(split.cand_flat))
        snews.discard(0)
        cc = split.candidate_counts
        out[name] = {
            "impressions": len(split),
            "distinct_news": len(snews),
            "new_vs_train": len(snews - train_news),
            "candidates_mean": round(float(cc.mean()), 2),
            "candidates_max": int(cc.max()),
        }
        if name == "dev" and split.label_flat is not None:
            out[name]["ctr"] = round(
                float(split.label_flat.sum() / max(len(split.label_flat), 1)), 4)
    print(json.dumps(out, indent=2))
    return 0


def cmd_bert_embeds(args) -> int:
    """Per-news BERT sentence vectors from a local HF encoder — replaces the
    reference's bert-as-service job (``data_processor.py:45-65``)."""
    from pytorch_news_recommender_tpu.data.bert_vectors import (
        build_bert_vectors,
    )

    tsvs = [args.train_dir + "/news.tsv", args.dev_dir + "/news.tsv"]
    if args.test_dir:
        tsvs.append(args.test_dir + "/news.tsv")
    emb = build_bert_vectors(tsvs, args.model_path, args.out,
                             batch_size=args.batch_size,
                             max_length=args.max_length)
    print(f"wrote {emb.shape} news vectors to {args.out}")
    return 0


def cmd_preprocess_adressa(args) -> int:
    from pytorch_news_recommender_tpu.config import DataConfig
    from pytorch_news_recommender_tpu.data import adressa

    cfg = DataConfig(
        history_len=args.history_len, sample_size=args.sample_size,
        min_history=args.min_history,
    )
    ds = adressa.build_dataset(
        cfg, args.events, train_fraction=args.train_fraction,
        dev_negatives=args.dev_negatives, seed=args.seed, out_dir=args.out,
        news_graph_neighbors=args.graph_neighbors)
    print(f"wrote artifacts to {args.out}: {ds.meta.to_json()}")
    return 0


def cmd_train(args) -> int:
    # Multi-host group formation MUST precede every other jax API call
    # (backend init makes it impossible) — so it is the first thing train
    # does. Single-process runs (no flags, no cluster env) skip it entirely.
    # Replaces the reference's broken --n_GPUs path (run_v0.py:21-22).
    from pytorch_news_recommender_tpu.parallel.distributed import initialize
    if getattr(args, "no_distributed", False):
        if any(a is not None for a in (args.coordinator, args.num_processes,
                                       args.process_id)):
            raise SystemExit(
                "error: --no-distributed contradicts the explicit cluster "
                "flags --coordinator/--num-processes/--process-id")
        os.environ["NEWSREC_NO_DISTRIBUTED"] = "1"
    if initialize(coordinator_address=args.coordinator,
                  num_processes=args.num_processes,
                  process_id=args.process_id):
        import jax
        print(f"multi-host runtime up: process {jax.process_index()}/"
              f"{jax.process_count()}, {len(jax.devices())} global devices",
              file=sys.stderr)

    from pytorch_news_recommender_tpu.train.checkpoint import CheckpointManager
    from pytorch_news_recommender_tpu.train.loop import Trainer
    from pytorch_news_recommender_tpu.utils.logging import JsonlLogger

    sample_size = args.sample_size
    if sample_size is None and args.model == "list_rank":
        sample_size = 15  # reference run_v0.py:44-45
    cfg = _build_config(args, sample_size)
    if args.epochs is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, num_epochs=args.epochs))
    if args.eval_step is not None:
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train,
                                           eval_step=args.eval_step))
    ds = _load_dataset(args, cfg)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state(seed=args.seed)

    save_dir = pathlib.Path(args.save_dir) / cfg.model.name
    mngr = CheckpointManager(save_dir, cfg)
    if args.load:
        state = CheckpointManager(args.load).restore(state)
        print(f"restored checkpoint from {args.load} "
              f"(step {int(state.step)})", file=sys.stderr)
    elif args.auto_resume and mngr.latest_step() is not None:
        # crash-restart recovery: pick up the run's own latest checkpoint
        # (full state: params + optimizer + step, so optimization continues
        # exactly — unlike the reference, which restarts the optimizer,
        # SURVEY.md §5 checkpoint/resume)
        state = mngr.restore(state)
        print(f"auto-resumed from {save_dir} (step {int(state.step)})",
              file=sys.stderr)

    log = JsonlLogger(save_dir / "metrics.jsonl")

    def ckpt_cb(state, metrics, step):
        mngr.save(step, state, metrics)

    profiling = False
    if args.profile_dir:
        import jax
        jax.profiler.start_trace(args.profile_dir)
        profiling = True
    try:
        state, history = trainer.fit(state, log_fn=log, checkpoint_cb=ckpt_cb)
    finally:
        if profiling:
            import jax
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}",
                  file=sys.stderr)
    if args.log_attention:
        # Attention-weight summaries over one batch (the working version of
        # the reference's commented-out TensorBoard hook, nrms_v0.py:94-122).
        # Runs the jnp path (same params) — the fused kernel never
        # materializes the weights.
        import jax.numpy as jnp

        from pytorch_news_recommender_tpu import models as _models
        from pytorch_news_recommender_tpu.data.loader import train_batches
        from pytorch_news_recommender_tpu.utils.inspect import (
            attention_maps, attention_summary,
        )

        icfg = dataclasses.replace(trainer.model.cfg, use_pallas=False)
        imodel = _models.build_model(icfg)
        import numpy as _np
        batch_np = next(train_batches(ds.train, min(64, cfg.train.batch_size),
                                      _np.random.default_rng(0), dedup=False))
        ibatch = {k: jnp.asarray(v) for k, v in batch_np.items()}
        maps = attention_maps(imodel, state.params, ibatch,
                              trainer.news_feats)
        for site, summ in attention_summary(maps).items():
            log({"tag": "attention", "site": site, **summ})

    if ds.dev is not None and len(ds.dev):
        final = trainer.evaluate(state)
        log({"tag": "final", **final})
        if mngr.latest_step() is None:
            # dev AUC never beat the checkpoint floor (train_eval.py:59):
            # keep the final state anyway so eval/submit have something
            mngr.save(int(state.step), state, final)
    mngr.close()
    from pytorch_news_recommender_tpu.utils.plotting import plot_loss
    png = plot_loss(save_dir / "metrics.jsonl")
    if png is not None:
        print(f"loss curve: {png}", file=sys.stderr)
    return 0


def cmd_eval(args) -> int:
    from pytorch_news_recommender_tpu.train.checkpoint import (
        CheckpointManager, load_config,
    )
    from pytorch_news_recommender_tpu.train.loop import Trainer

    cfg = load_config(args.ckpt)
    ds = _load_dataset(args, cfg)
    trainer = Trainer(cfg, ds)
    state = CheckpointManager(args.ckpt).restore(trainer.init_state())
    split = ds.test if args.split == "test" else ds.dev
    m = trainer.evaluate(state, split=split,
                         max_impressions=args.max_impressions)
    import json
    print(json.dumps(m))
    return 0


def cmd_submit(args) -> int:
    from pytorch_news_recommender_tpu.train.checkpoint import (
        CheckpointManager, load_config,
    )
    from pytorch_news_recommender_tpu.train.loop import Trainer
    from pytorch_news_recommender_tpu.train.submit import write_submission

    cfg = load_config(args.ckpt)
    ds = _load_dataset(args, cfg)
    trainer = Trainer(cfg, ds)
    state = CheckpointManager(args.ckpt).restore(trainer.init_state())
    path = write_submission(trainer, state, path=args.out)
    print(f"saved to {path}")
    return 0


def cmd_export_vectors(args) -> int:
    """Encode the whole corpus once and write the vector table to .npz —
    decouples offline corpus encoding from serving startup (load the file
    into any ANN/retrieval system, or ship it to a serving fleet)."""
    import numpy as np

    from pytorch_news_recommender_tpu.train.checkpoint import (
        CheckpointManager, load_config,
    )
    from pytorch_news_recommender_tpu.train.loop import Trainer

    cfg = load_config(args.ckpt)
    ds = _load_dataset(args, cfg)
    trainer = Trainer(cfg, ds)
    state = CheckpointManager(args.ckpt).restore(trainer.init_state())
    vecs = np.asarray(trainer.compute_news_vectors(state.params),
                      dtype=np.float32)
    out = {"news_vectors": vecs}
    if args.int8:
        scale = np.maximum(np.abs(vecs).max(axis=1, keepdims=True) / 127.0,
                           1e-12)
        out = {"news_q": np.clip(np.round(vecs / scale), -127,
                                 127).astype(np.int8),
               "news_scale": scale.astype(np.float32)}
    np.savez_compressed(args.out, **out)
    print(f"saved {vecs.shape[0]} news vectors ({vecs.shape[1]}d, "
          f"{'int8+scale' if args.int8 else 'float32'}) to {args.out}")
    return 0


def cmd_serve(args) -> int:
    """Stand up the HTTP serving daemon on a trained checkpoint."""
    from pytorch_news_recommender_tpu.serve import Recommender
    from pytorch_news_recommender_tpu.server import RecommenderServer
    from pytorch_news_recommender_tpu.train.checkpoint import load_config

    cfg = load_config(args.ckpt)
    ds = _load_dataset(args, cfg)
    mesh = None
    if args.mesh:
        from pytorch_news_recommender_tpu.parallel.mesh import make_mesh
        mesh = make_mesh(cfg.mesh)
    rec = Recommender.from_checkpoint(args.ckpt, ds,
                                      corpus_cache=args.corpus_cache,
                                      vectors_file=args.vectors,
                                      mesh=mesh)
    srv = RecommenderServer(rec, host=args.host, port=args.port,
                            batch_window_ms=args.batch_window_ms)
    print(f"serving {cfg.model.name} ({ds.news.n_news} news) "
          f"on http://{args.host}:{srv.port} — GET /healthz, "
          f"POST /score, POST /top_k, POST /add_news")
    try:
        srv.start(block=True)
    except KeyboardInterrupt:
        srv.stop()
    return 0


def cmd_models(args) -> int:
    import importlib

    from pytorch_news_recommender_tpu.config import FAMILY_TRAIN_DEFAULTS
    from pytorch_news_recommender_tpu.models import available_models

    for name in available_models():
        try:  # registry names match module names today; stay robust if not
            mod = importlib.import_module(
                f"pytorch_news_recommender_tpu.models.{name}")
            doc = (mod.__doc__ or "").strip().splitlines()
        except ImportError:
            doc = []
        head = doc[0].rstrip(".") if doc else ""
        tags = []
        fam = FAMILY_TRAIN_DEFAULTS.get(name)
        if fam:
            tags.append("defaults: " + ", ".join(
                f"{k}={v}" for k, v in fam.items()))
        print(f"{name:12s} {head}" + (f"  [{'; '.join(tags)}]" if tags else ""))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="pytorch_news_recommender_tpu",
        description="TPU-native news recommendation framework",
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("preprocess", help="MIND TSVs -> columnar artifacts")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--dev-dir", required=True)
    p.add_argument("--test-dir", default=None)
    p.add_argument("--glove", default=None, help="GloVe vectors txt")
    p.add_argument("--word-embed-size", type=int, default=300)
    p.add_argument("--bert-npz", default=None,
                   help="precomputed per-news sentence vectors (npz)")
    p.add_argument("--graph-neighbors", type=int, default=0,
                   help="build co-click news graph with this fan-out")
    p.add_argument("--history-len", type=int, default=50)
    p.add_argument("--sample-size", type=int, default=5)
    p.add_argument("--min-history", type=int, default=5)
    p.add_argument("--entity-nums", type=int, default=10)
    p.add_argument("--word-freq-threshold", type=int, default=3,
                   help="min corpus frequency for a vocab word (reference "
                        "hardcodes 3, data_processor.py:181-183)")
    p.add_argument("--seed", type=int, default=2020)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_preprocess)

    p = sub.add_parser("stats", help="dataset statistics over built artifacts")
    p.add_argument("--artifacts", required=True,
                   help="artifact dir written by preprocess")
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("bert-embeds",
                       help="news TSVs -> per-news BERT vectors npz "
                            "(local HF encoder; feeds preprocess --bert-npz)")
    p.add_argument("--train-dir", required=True)
    p.add_argument("--dev-dir", required=True)
    p.add_argument("--test-dir", default=None)
    p.add_argument("--model-path", required=True,
                   help="local HuggingFace encoder checkpoint dir")
    p.add_argument("--batch-size", type=int, default=64)
    p.add_argument("--max-length", type=int, default=64)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_bert_embeds)

    p = sub.add_parser("preprocess-adressa",
                       help="Adressa event JSONL -> columnar artifacts")
    p.add_argument("--graph-neighbors", type=int, default=0,
                   help="build the [N, k] co-click news graph from "
                        "train-period clicks (GNN family)")
    p.add_argument("--events", nargs="+", required=True,
                   help="event JSONL file(s)")
    p.add_argument("--train-fraction", type=float, default=0.9)
    p.add_argument("--dev-negatives", type=int, default=20)
    p.add_argument("--history-len", type=int, default=50)
    p.add_argument("--sample-size", type=int, default=5)
    p.add_argument("--min-history", type=int, default=5)
    p.add_argument("--seed", type=int, default=2020)
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_preprocess_adressa)

    p = sub.add_parser("train", help="train + eval + checkpoint")
    _add_common(p)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--eval-step", type=int, default=None,
                   help="eval (and best-AUC checkpoint) every N steps "
                        "(reference config.py: 5000)")
    p.add_argument("--sample-size", type=int, default=None)
    p.add_argument("--seed", type=int, default=422)  # run_v0.py:33-41
    p.add_argument("--save-dir", default="save_model")
    p.add_argument("--load", default=None, help="checkpoint dir to resume")
    p.add_argument("--auto-resume", action="store_true",
                   help="restore this run's latest checkpoint from the save "
                        "dir if one exists (crash-restart recovery)")
    p.add_argument("--log-attention", action="store_true",
                   help="log per-site additive-attention weight summaries "
                        "to metrics.jsonl after training")
    p.add_argument("--description", default="")
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax.profiler trace of the run here")
    p.add_argument("--skip-nonfinite", action="store_true",
                   help="skip (not apply) updates whose loss is non-finite")
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for a manual "
                        "multi-host cluster (Cloud TPU pods / SLURM / MPI "
                        "auto-detect without flags)")
    p.add_argument("--num-processes", type=int, default=None,
                   help="total process count (with --coordinator)")
    p.add_argument("--process-id", type=int, default=None,
                   help="this process's rank (with --coordinator)")
    p.add_argument("--no-distributed", action="store_true",
                   help="force single-process: skip cluster auto-detection "
                        "(e.g. a deliberately solo run inside a multi-task "
                        "SLURM allocation); NEWSREC_NO_DISTRIBUTED=1 is the "
                        "library-level equivalent")
    p.add_argument("--debug-nans", action="store_true",
                   help="enable jax_debug_nans (fail fast on NaN)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("eval", help="evaluate a checkpoint on dev/test")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--split", choices=("dev", "test"), default="dev")
    p.add_argument("--max-impressions", type=int, default=None)
    p.set_defaults(fn=cmd_eval)

    p = sub.add_parser("serve", help="HTTP serving daemon on a checkpoint")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--corpus-cache", choices=("native", "int8"),
                   default="native",
                   help="int8 = per-row symmetrically quantized corpus "
                        "vector table (4x smaller than f32, ranking "
                        "preserved)")
    p.add_argument("--vectors", default=None,
                   help="precomputed corpus vectors from `export-vectors` "
                        "(skips the startup corpus encode)")
    p.add_argument("--batch-window-ms", type=float, default=0.0,
                   help="micro-batching window for /score: wait up to this "
                        "long after a request arrives to batch concurrent "
                        "traffic into one device call (0 = off)")
    p.add_argument("--mesh", action="store_true",
                   help="row-shard the corpus vector cache over all devices "
                        "(corpora larger than one chip's HBM); the top_k "
                        "matmul shards with it")
    p.set_defaults(fn=cmd_serve)

    p = sub.add_parser("export-vectors",
                       help="encode the corpus and write news vectors (.npz)")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--int8", action="store_true",
                   help="per-row symmetric int8 + f32 scale instead of f32")
    p.set_defaults(fn=cmd_export_vectors)

    p = sub.add_parser("submit", help="write MIND leaderboard rank file")
    _add_common(p)
    p.add_argument("--ckpt", required=True)
    p.add_argument("--out", default=None)
    p.set_defaults(fn=cmd_submit)

    p = sub.add_parser("models", help="list registered model families")
    p.set_defaults(fn=cmd_models)

    args = parser.parse_args(argv)
    from pytorch_news_recommender_tpu.utils.compile_cache import enable
    enable()
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
