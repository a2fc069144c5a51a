"""Serving-path benchmark on the attached accelerator.

Measures the three serving costs of :class:`serve.Recommender` at MIND scale
(50k-news corpus, NRMS):

* corpus encode rate (news/sec) — the load-time cost of the two-tower cache;
* per-request ``score`` latency (user tower + head over a padded candidate
  list) at a few batch widths;
* corpus-wide ``top_k`` retrieval latency ([D] @ [D, N] + lax.top_k).

``--mesh N`` additionally measures the DISTRIBUTED retrieval path (the
``cli serve --mesh`` mode): the corpus vector cache row-shards over an
N-device mesh and the top_k matmul shards with it, XLA gathering the
per-shard partial top-k. With fewer than N real devices it forces an
N-device virtual CPU mesh (functional numbers, not hardware speed) — the
same harness produces the real numbers on a pod slice.

Request latencies through the axon tunnel include ~25 ms of fixed host-fetch
RTT; the marginal (slope) number excludes it and is the on-host figure.

Run: python benchmarks/serve_bench.py [--mesh 8]
"""

from __future__ import annotations

import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main(mesh_size: int = 0, force_cpu: bool = False, corpus: int = 50000):
    import jax

    if force_cpu:
        # The hosted axon TPU plugin overrides JAX_PLATFORMS from the
        # environment; pin via config before the backend initializes.
        jax.config.update("jax_platforms", "cpu")

    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.serve import Recommender
    from pytorch_news_recommender_tpu.train.loop import Trainer
    from pytorch_news_recommender_tpu.utils.compile_cache import enable

    enable()
    cfg = Config(
        data=DataConfig(dataset="synthetic"),
        model=ModelConfig(
            word_embed_size=300, num_attention_heads=10, user_heads_num=10,
            query_vector_dim=200, compute_dtype="bfloat16",
            use_pallas=not force_cpu,
        ),
        train=TrainConfig(batch_size=128),
    )
    ds = synthetic.generate(cfg.data, seed=0, n_news=corpus, vocab_size=45800,
                            n_train=128, n_dev=8)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state(seed=0)
    print(f"devices: {jax.devices()}", file=sys.stderr, flush=True)

    t0 = time.perf_counter()
    rec = Recommender(cfg, ds, state.params)
    _ = np.asarray(rec.news_vecs[:1, :1])
    dt = time.perf_counter() - t0
    n = ds.news.n_news
    print(f"corpus encode (cold, incl. compile): {n} news in {dt:.2f}s",
          flush=True)
    # warm encode rate: same jit cache, fresh Recommender
    t0 = time.perf_counter()
    rec2 = Recommender(cfg, ds, state.params)
    _ = np.asarray(rec2.news_vecs[:1, :1])
    dt = time.perf_counter() - t0
    print(f"corpus encode (warm): {n} news in {dt:.2f}s -> "
          f"{n/dt:,.0f} news/s", flush=True)
    del rec2

    rng = np.random.default_rng(0)
    hist = [int(x) for x in rng.integers(1, n, size=30)]  # JSON-safe ints

    # per-request score latency (marginal over a chain of requests)
    for width in (16, 300):
        cands = list(rng.integers(1, n, size=width))
        rec.score(hist, cands)  # compile
        times = {}
        for N in (5, 25):
            t0 = time.perf_counter()
            for _ in range(N):
                rec.score(hist, cands)
            times[N] = time.perf_counter() - t0
        ms = (times[25] - times[5]) / 20 * 1e3
        print(f"score({width} candidates): {ms:.2f} ms/request "
              f"(incl. host round-trip)", flush=True)

    # corpus-wide top-k
    rec.top_k(hist, k=10)  # compile
    times = {}
    for N in (5, 25):
        t0 = time.perf_counter()
        for _ in range(N):
            rec.top_k(hist, k=10)
        times[N] = time.perf_counter() - t0
    ms = (times[25] - times[5]) / 20 * 1e3
    print(f"top_k(10) over {n}-news corpus: {ms:.2f} ms/request "
          f"(incl. host round-trip)", flush=True)

    # int8 corpus cache: 4x smaller resident table, retrieval streams a
    # quarter of the bytes; recall@10 vs the float cache printed alongside
    rec8 = Recommender(cfg, ds, state.params, corpus_cache="int8")
    f_bytes = n * rec.news_vecs.shape[1] * rec.news_vecs.dtype.itemsize
    q_bytes = (rec8.news_q.size * 1 + rec8.news_scale.size * 4)
    ids_f, _ = rec.top_k(hist, k=10)
    ids_q, _ = rec8.top_k(hist, k=10)  # also compiles
    recall = len(set(map(int, ids_f)) & set(map(int, ids_q))) / 10
    times = {}
    for N in (5, 25):
        t0 = time.perf_counter()
        for _ in range(N):
            rec8.top_k(hist, k=10)
        times[N] = time.perf_counter() - t0
    ms = (times[25] - times[5]) / 20 * 1e3
    print(f"top_k(10) int8 cache: {ms:.2f} ms/request; cache "
          f"{q_bytes/2**20:.1f} MB vs {f_bytes/2**20:.1f} MB native; "
          f"recall@10 vs native {recall:.2f}", flush=True)

    if mesh_size > 1:
        # distributed retrieval: corpus cache row-sharded over the mesh,
        # top_k matmul sharded with it (the `cli serve --mesh` path)
        import dataclasses as _dc

        from pytorch_news_recommender_tpu.parallel.mesh import make_mesh

        mcfg = _dc.replace(cfg.mesh, model_parallel_size=1)
        mesh = make_mesh(mcfg, devices=jax.devices()[:mesh_size])
        rec_m = Recommender(cfg, ds, state.params, mesh=mesh)
        # The corpus cache must ACTUALLY be row-sharded (serve.put pads rows
        # to the mesh; a replicated fallback here would silently measure the
        # wrong path — ADVICE r2):
        axis = mesh.axis_names[0]
        spec = rec_m.news_vecs.sharding.spec
        assert len(spec) >= 1 and spec[0] == axis, (
            f"corpus cache not sharded: spec={spec}")
        print(f"corpus cache sharding: spec={tuple(spec)} over "
              f"{mesh_size} devices (rows padded to multiple)", flush=True)
        ids_m, _ = rec_m.top_k(hist, k=10)  # compile
        recall_m = len(set(map(int, ids_f)) & set(map(int, ids_m))) / 10
        times = {}
        for N in (5, 25):
            t0 = time.perf_counter()
            for _ in range(N):
                rec_m.top_k(hist, k=10)
            times[N] = time.perf_counter() - t0
        ms = (times[25] - times[5]) / 20 * 1e3
        kind = mesh.devices.ravel()[0].platform
        print(f"top_k(10) sharded over {mesh_size} {kind} devices: "
              f"{ms:.2f} ms/request; recall@10 vs single-device "
              f"{recall_m:.2f}", flush=True)
        del rec_m

        # int8 + mesh COMPOSITION: the quantized corpus cache row-shards the
        # same way (4x smaller per-device residency AND N-way split)
        rec_m8 = Recommender(cfg, ds, state.params, corpus_cache="int8",
                             mesh=mesh)
        spec8 = rec_m8.news_q.sharding.spec
        assert len(spec8) >= 1 and spec8[0] == axis, (
            f"int8 cache not sharded: spec={spec8}")
        ids_m8, _ = rec_m8.top_k(hist, k=10)  # compile
        recall_m8 = len(set(map(int, ids_f)) & set(map(int, ids_m8))) / 10
        times = {}
        for N in (5, 25):
            t0 = time.perf_counter()
            for _ in range(N):
                rec_m8.top_k(hist, k=10)
            times[N] = time.perf_counter() - t0
        ms = (times[25] - times[5]) / 20 * 1e3
        per_dev = rec_m8.news_q.shape[0] // mesh_size
        print(f"top_k(10) int8 sharded over {mesh_size} {kind} devices: "
              f"{ms:.2f} ms/request; {per_dev} int8 rows/device; "
              f"recall@10 vs native single-device {recall_m8:.2f}",
              flush=True)
        del rec_m8

    http_load(rec, hist, n)


def http_load(rec, hist, n, n_requests: int = 96, concurrency: int = 12):
    """Concurrent HTTP /score load through the daemon: p50/p99 latency and
    aggregate throughput, with and without the micro-batching window."""
    import http.client
    import json
    import threading

    from pytorch_news_recommender_tpu.server import RecommenderServer

    rng = np.random.default_rng(1)
    cands = [list(map(int, rng.integers(1, n, size=12)))
             for _ in range(n_requests)]

    for window in (0.0, 5.0):
        srv = RecommenderServer(rec, port=0, batch_window_ms=window)
        srv.start(block=False)
        lat: list = [None] * n_requests
        sem = threading.Semaphore(concurrency)

        def hit(i):
            with sem:
                t0 = time.perf_counter()
                conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                                  timeout=60)
                conn.request("POST", "/score", body=json.dumps(
                    {"history": hist, "candidates": cands[i]}))
                r = conn.getresponse()
                assert r.status == 200, r.status
                r.read()
                lat[i] = time.perf_counter() - t0

        try:
            hit(0)  # warm any new (B, width) executables
            t0 = time.perf_counter()
            threads = [threading.Thread(target=hit, args=(i,))
                       for i in range(n_requests)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
            wall = time.perf_counter() - t0
            ms = np.asarray([x * 1e3 for x in lat if x is not None])
            print(f"HTTP /score load (window={window:g} ms, "
                  f"{concurrency} conc): p50 {np.percentile(ms, 50):.1f} ms  "
                  f"p99 {np.percentile(ms, 99):.1f} ms  "
                  f"{len(ms)/wall:,.0f} req/s", flush=True)
        finally:
            srv.stop()


if __name__ == "__main__":
    import argparse
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--mesh", type=int, default=0,
                    help="also measure top_k with the corpus row-sharded "
                         "over this many devices (forces a virtual CPU mesh "
                         "unless --mesh-real-devices)")
    ap.add_argument("--mesh-real-devices", action="store_true",
                    help="use the attached accelerators for --mesh instead "
                         "of a virtual CPU mesh (real pod-slice numbers)")
    ap.add_argument("--corpus", type=int, default=50000,
                    help="corpus size in news (MIND-large is ~101k; try 1M "
                         "for production-retrieval scale)")
    a = ap.parse_args()
    force_cpu = a.mesh > 1 and not a.mesh_real_devices
    if force_cpu:
        # a virtual CPU mesh backs the sharded path; the XLA flag must be
        # set before jax initializes (the platform pin happens via
        # jax.config inside main — env JAX_PLATFORMS alone is overridden
        # by hosted TPU plugins)
        flags = os.environ.get("XLA_FLAGS", "")
        if "host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={a.mesh}"
            ).strip()
    main(mesh_size=a.mesh, force_cpu=force_cpu, corpus=a.corpus)
