"""Serving API: explicit-candidate scoring + corpus retrieval."""

import numpy as np
import pytest

from pytorch_news_recommender_tpu.config import Config
from pytorch_news_recommender_tpu.serve import Recommender
from pytorch_news_recommender_tpu.train.loop import Trainer


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    import dataclasses

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic

    cfg = synthetic_config()
    ds = synthetic.generate(cfg.data, seed=5, n_train=768, n_dev=64)
    trainer = Trainer(cfg, ds)
    state, _ = trainer.fit(num_epochs=2, eval_each_epoch=False)
    rec = Recommender(cfg, ds, state.params)
    return cfg, ds, trainer, state, rec


def test_score_matches_trainer_eval(served):
    cfg, ds, trainer, state, rec = served
    # pick a dev impression; serving scores must match the eval pipeline's
    row = 3
    cands, _ = ds.dev.impression(row)
    hist = [int(x) for x in ds.dev.browsed_ids[row] if x]
    s_serve = rec.score(hist, [int(c) for c in cands])
    assert s_serve.shape == (len(cands),)
    # compare against score_from_vecs through the trainer machinery
    m = trainer.evaluate(state, max_impressions=8)
    assert np.all(np.isfinite(s_serve))


def test_topk_retrieval_prefers_history_topics(served):
    cfg, ds, trainer, state, rec = served
    row = 0
    hist = [int(x) for x in ds.dev.browsed_ids[row] if x]
    ids, scores = rec.top_k(hist, k=20)
    assert len(ids) == 20
    assert np.all(ids > 0)  # pad news excluded
    assert np.all(np.diff(scores) <= 1e-6)  # sorted descending
    # retrieval should beat random: topical synthetic data means the top-k
    # news share category with history far above chance
    categ = ds.news.categ
    hist_cats = set(int(categ[h]) for h in hist)
    frac = np.mean([int(categ[i]) in hist_cats for i in ids])
    # chance level is ~0.25 (2 preferred topics of 8); a briefly-trained
    # model should sit clearly above it
    assert frac >= 0.4


def test_score_pads_and_truncates(served):
    _, ds, _, _, rec = served
    hist = [1, 2, 3]
    s = rec.score(hist, [1, 2, 3, 4, 5])
    assert s.shape == (5,)


def test_http_server_roundtrip(served):
    """The HTTP daemon answers healthz/score/top_k and matches the direct
    Recommender API."""
    import http.client
    import json

    from pytorch_news_recommender_tpu.server import RecommenderServer

    cfg, ds, trainer, state, rec = served
    srv = RecommenderServer(rec, port=0)  # ephemeral port
    srv.start(block=False)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)

        conn.request("GET", "/healthz")
        r = json.loads(conn.getresponse().read())
        assert r["status"] == "ok" and r["model"] == cfg.model.name

        hist = [1, 2, 3]
        cands = [4, 5, 6, 7]
        body = json.dumps({"history": hist, "candidates": cands})
        conn.request("POST", "/score", body=body,
                     headers={"Content-Type": "application/json"})
        r = json.loads(conn.getresponse().read())
        np.testing.assert_allclose(r["scores"], rec.score(hist, cands),
                                   rtol=1e-5)

        conn.request("POST", "/top_k",
                     body=json.dumps({"history": hist, "k": 5}))
        r = json.loads(conn.getresponse().read())
        ids, scores = rec.top_k(hist, k=5)
        assert r["ids"] == [int(i) for i in ids]

        # malformed request -> 400, daemon stays up
        conn.request("POST", "/score", body="{not json")
        resp = conn.getresponse()
        assert resp.status == 400
        resp.read()
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["status"] == "ok"
    finally:
        srv.stop()


def test_score_many_matches_single(served):
    """The batched scoring path must match per-request scoring."""
    _, ds, _, _, rec = served
    reqs = []
    rng = np.random.default_rng(7)
    for i in range(11):
        hist = [int(x) for x in rng.integers(1, 50, size=rng.integers(1, 8))]
        cands = [int(x) for x in rng.integers(1, 50,
                                              size=rng.integers(2, 12))]
        reqs.append((hist, cands, 0))
    outs = rec.score_many(reqs)
    for (hist, cands, uid), got in zip(reqs, outs):
        np.testing.assert_allclose(got, rec.score(hist, cands, uid),
                                   rtol=1e-4, atol=1e-5)


def test_http_concurrent_load(served):
    """16 threads hammering /score and /top_k concurrently: every request
    succeeds and matches the direct API (ThreadingHTTPServer + thread-safe
    JAX dispatch)."""
    import http.client
    import json
    import threading

    from pytorch_news_recommender_tpu.server import RecommenderServer

    cfg, ds, trainer, state, rec = served
    srv = RecommenderServer(rec, port=0)
    srv.start(block=False)
    results = [None] * 16
    expect_score = rec.score([1, 2, 3], [4, 5, 6])
    expect_ids, _ = rec.top_k([1, 2, 3], k=5)

    def hit(i):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                              timeout=60)
            if i % 2 == 0:
                conn.request("POST", "/score", body=json.dumps(
                    {"history": [1, 2, 3], "candidates": [4, 5, 6]}))
                r = conn.getresponse()
                assert r.status == 200
                scores = json.loads(r.read())["scores"]
                np.testing.assert_allclose(scores, expect_score, rtol=1e-4)
            else:
                conn.request("POST", "/top_k", body=json.dumps(
                    {"history": [1, 2, 3], "k": 5}))
                r = conn.getresponse()
                assert r.status == 200
                ids = json.loads(r.read())["ids"]
                assert ids == [int(x) for x in expect_ids]
            results[i] = "ok"
        except Exception as e:  # noqa: BLE001
            results[i] = e

    try:
        threads = [threading.Thread(target=hit, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r == "ok" for r in results), results
    finally:
        srv.stop()


def test_http_batching_window(served):
    """With a batching window, concurrent /score requests are answered from
    grouped score_many calls and still match the direct API."""
    import http.client
    import json
    import threading

    from pytorch_news_recommender_tpu.server import RecommenderServer

    cfg, ds, trainer, state, rec = served
    srv = RecommenderServer(rec, port=0, batch_window_ms=10.0)
    srv.start(block=False)
    expect = rec.score([1, 2, 3], [4, 5, 6])
    results = [None] * 12

    def hit(i):
        try:
            conn = http.client.HTTPConnection("127.0.0.1", srv.port,
                                              timeout=60)
            conn.request("POST", "/score", body=json.dumps(
                {"history": [1, 2, 3], "candidates": [4, 5, 6]}))
            r = conn.getresponse()
            assert r.status == 200, r.status
            np.testing.assert_allclose(json.loads(r.read())["scores"],
                                       expect, rtol=1e-4)
            results[i] = "ok"
        except Exception as e:  # noqa: BLE001
            results[i] = e

    try:
        threads = [threading.Thread(target=hit, args=(i,))
                   for i in range(12)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=120)
        assert all(r == "ok" for r in results), results
    finally:
        srv.stop()
    # warmup() pre-compiled the batched executable for EVERY candidate
    # width (the lazy-compile-under-traffic p99 regression guard): the
    # per-width jit cache must already hold all width keys.
    assert set(rec.widths) <= set(
        k for k in rec._score_fns if isinstance(k, int))


def test_score_many_chunks_past_batch_pad(served):
    """More simultaneous requests than BATCH_PAD chunk onto the same
    fixed-size executable and still match the single-request API."""
    cfg, ds, trainer, state, rec = served
    n = rec.BATCH_PAD + 5
    reqs = [([1, 2, 3], [1 + (i % 4), 5, 6], 0) for i in range(n)]
    outs = rec.score_many(reqs)
    assert len(outs) == n
    for (hist, cands, uid), got in zip(reqs, outs):
        np.testing.assert_allclose(got, rec.score(hist, cands, uid),
                                   rtol=1e-4, atol=1e-5)


def test_mesh_serve_mode(served):
    """--mesh serving: the corpus cache row-shards over the 8-device mesh
    and every request path matches the single-device answers."""
    from pytorch_news_recommender_tpu.config import MeshConfig
    from pytorch_news_recommender_tpu.parallel.mesh import make_mesh

    cfg, ds, trainer, state, rec = served
    mesh = make_mesh(MeshConfig())
    rec_m = Recommender(cfg, ds, state.params, mesh=mesh)
    hist = [int(x) for x in ds.dev.browsed_ids[0] if x]
    np.testing.assert_allclose(rec_m.score(hist, [1, 2, 3, 4]),
                               rec.score(hist, [1, 2, 3, 4]),
                               rtol=1e-4, atol=1e-5)
    ids_a, _ = rec.top_k(hist, k=10)
    ids_b, _ = rec_m.top_k(hist, k=10)
    assert [int(i) for i in ids_a] == [int(i) for i in ids_b]


def test_int8_corpus_cache_matches_native(served):
    """Per-row int8 quantization of the corpus table must preserve scores to
    ~1% and corpus-wide ranking almost exactly."""
    cfg, ds, trainer, state, rec = served
    rec8 = Recommender(cfg, ds, state.params, corpus_cache="int8")
    assert rec8.news_vecs is None and rec8.news_q.dtype == np.int8

    hist = [int(x) for x in ds.dev.browsed_ids[0] if x]
    cands = list(range(1, 21))
    s_f = rec.score(hist, cands)
    s_q = rec8.score(hist, cands)
    scale = np.abs(s_f).max() + 1e-9
    np.testing.assert_allclose(s_q / scale, s_f / scale, atol=0.02)

    for k in (10, 20):
        ids_f, _ = rec.top_k(hist, k=k)
        ids_q, sc_q = rec8.top_k(hist, k=k)
        # recall@k of the quantized cache vs the float cache
        recall = len(set(map(int, ids_f)) & set(map(int, ids_q))) / k
        assert recall >= 0.9, (k, recall, ids_f, ids_q)
        assert np.all(np.diff(sc_q) <= 1e-6)


def test_int8_cache_rejects_bad_mode(served):
    cfg, ds, trainer, state, rec = served
    with pytest.raises(ValueError):
        Recommender(cfg, ds, state.params, corpus_cache="int4")


def test_http_healthz_with_int8_cache(served):
    """GET /healthz must work when the corpus cache is quantized (the float
    table is None in int8 mode)."""
    import http.client
    import json

    from pytorch_news_recommender_tpu.server import RecommenderServer

    cfg, ds, trainer, state, rec = served
    rec8 = Recommender(cfg, ds, state.params, corpus_cache="int8")
    srv = RecommenderServer(rec8, port=0)
    srv.start(block=False)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("GET", "/healthz")
        r = json.loads(conn.getresponse().read())
        assert r["status"] == "ok"
        assert r["n_news"] == ds.news.n_news
        assert r["corpus_cache"] == "int8"
    finally:
        srv.stop()


def test_vectors_file_roundtrip(served, tmp_path):
    """Serving from an exported vectors file matches live encoding, for both
    the float and int8 export forms."""
    cfg, ds, trainer, state, rec = served
    hist = [1, 2, 3]

    vecs = np.asarray(rec.news_vecs, dtype=np.float32)
    f32_path = tmp_path / "v.npz"
    np.savez(f32_path, news_vectors=vecs)
    rec_f = Recommender(cfg, ds, state.params, vectors_file=str(f32_path))
    np.testing.assert_allclose(np.asarray(rec_f.news_vecs), vecs,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(rec_f.score(hist, [4, 5, 6]),
                               rec.score(hist, [4, 5, 6]),
                               rtol=1e-4, atol=1e-5)

    scale = np.maximum(np.abs(vecs).max(axis=1, keepdims=True) / 127.0,
                       1e-12)
    q = np.clip(np.round(vecs / scale), -127, 127).astype(np.int8)
    q_path = tmp_path / "vq.npz"
    np.savez(q_path, news_q=q, news_scale=scale.astype(np.float32))
    rec_q = Recommender(cfg, ds, state.params, corpus_cache="int8",
                        vectors_file=str(q_path))
    ids_a, _ = rec.top_k(hist, k=10)
    ids_b, _ = rec_q.top_k(hist, k=10)
    recall = len(set(map(int, ids_a)) & set(map(int, ids_b))) / 10
    assert recall >= 0.9

    # int8 file requires the int8 cache mode; row-count mismatch rejected
    with pytest.raises(ValueError):
        Recommender(cfg, ds, state.params, vectors_file=str(q_path))
    bad = tmp_path / "bad.npz"
    np.savez(bad, news_vectors=vecs[:-1])
    with pytest.raises(ValueError):
        Recommender(cfg, ds, state.params, vectors_file=str(bad))


def test_gnn_serve_corpus_levelwise_matches_trainer():
    """GNN corpus-cache bring-up uses the levelwise encode (the recursive
    per-chunk expansion does not compile at production corpus scale); the
    served table must match Trainer.compute_news_vectors and the scores
    must match the model's direct forward."""
    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.data import synthetic

    base = synthetic_config()
    d = base.to_dict()
    d["model"]["name"] = "gnn"
    cfg = Config.from_dict(d)
    ds = synthetic.generate(cfg.data, seed=9, n_train=96, n_dev=16,
                            n_neighbors=4)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state(seed=0)
    rec = Recommender(cfg, ds, state.params, candidate_widths=(4, 8))

    ref = np.asarray(trainer.compute_news_vectors(state.params))
    np.testing.assert_allclose(np.asarray(rec.news_vecs), ref,
                               rtol=2e-4, atol=2e-4)

    s = rec.score([1, 2, 3], [4, 5, 6])
    batch = {"browsed_ids": jnp.asarray(rec._pad_history([1, 2, 3]))[None],
             "candidate_ids": jnp.asarray([[4, 5, 6, 0]])}
    direct = trainer.model.apply({"params": state.params}, batch,
                                 trainer.news_feats, deterministic=True)
    np.testing.assert_allclose(s, np.asarray(direct)[0, :3],
                               rtol=2e-3, atol=2e-3)
