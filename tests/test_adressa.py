"""Adressa event-log pipeline tests on synthesized JSONL fixtures."""

import json

import numpy as np
import pytest

from pytorch_news_recommender_tpu.config import DataConfig
from pytorch_news_recommender_tpu.data import adressa


@pytest.fixture()
def events_file(tmp_path):
    rng = np.random.default_rng(0)
    path = tmp_path / "events.jsonl"
    lines = []
    news = [(f"art{i}", f"Nyheter artikkel nummer {i} idag",
             "nyheter|trondheim" if i % 2 else "sport|fotball")
            for i in range(20)]
    t = 1000
    for step in range(300):
        uid = f"u{rng.integers(0, 8)}"
        nid, title, cat = news[int(rng.integers(0, len(news)))]
        lines.append(json.dumps({
            "uid": uid, "id": nid, "title": title, "category1": cat,
            "time": t}))
        t += 10
    path.write_text("\n".join(lines) + "\n")
    return path


@pytest.fixture()
def cfg():
    return DataConfig(history_len=10, sample_size=3, min_history=3)


def test_build_dataset(events_file, cfg):
    ds = adressa.build_dataset(cfg, [events_file], dev_negatives=5)
    assert ds.meta.n_news == 21
    assert ds.meta.category_nums == 3   # nyheter, sport (+pad)
    assert ds.meta.subcategory_nums == 3
    # train groups: positive at slot 0, K=3 negatives, all within corpus
    assert ds.train.candidate_ids.shape[1] == 4
    assert np.all(ds.train.candidate_ids[:, 0] > 0)
    assert np.all(ds.train.candidate_ids < ds.meta.n_news)
    # negatives never equal the positive
    assert np.all(ds.train.candidate_ids[:, 1:] !=
                  ds.train.candidate_ids[:, :1])
    # dev: chronological tail, 1+5 candidates, label 1 at slot 0
    assert ds.dev is not None and len(ds.dev) > 0
    c, y = ds.dev.impression(0)
    assert len(c) == 6 and y[0] == 1 and y[1:].sum() == 0
    # vocab built from Norwegian titles (4 words survive digit-stripping)
    assert ds.meta.n_words == 5


def test_determinism(events_file, cfg):
    a = adressa.build_dataset(cfg, [events_file])
    b = adressa.build_dataset(cfg, [events_file])
    np.testing.assert_array_equal(a.train.candidate_ids, b.train.candidate_ids)
    np.testing.assert_array_equal(a.train.browsed_ids, b.train.browsed_ids)


def test_history_is_chronological(events_file, cfg):
    ds = adressa.build_dataset(cfg, [events_file])
    # left-padded histories: once nonzero, stays nonzero
    h = ds.train.browsed_ids
    nz = h != 0
    for row in nz:
        first = np.argmax(row)
        assert np.all(row[first:])


def test_trains_a_model(events_file, cfg):
    import dataclasses

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.train.loop import Trainer

    ds = adressa.build_dataset(cfg, [events_file], dev_negatives=5)
    base = synthetic_config()
    full = dataclasses.replace(
        base,
        data=dataclasses.replace(cfg, eval_buckets=(8,)),
        train=dataclasses.replace(base.train, batch_size=8,
                                  eval_batch_size=8),
    )
    trainer = Trainer(full, ds)
    state = trainer.init_state(seed=0)
    import jax
    from pytorch_news_recommender_tpu.data.loader import train_batches
    batch = next(train_batches(ds.train, 8, np.random.default_rng(0)))
    state, metrics = trainer.run_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    m = trainer.evaluate(state)
    assert 0.0 <= m["auc"] <= 1.0


def test_coclick_graph_train_only(events_file, cfg):
    """news_graph_neighbors builds the GNN co-click graph from TRAIN-period
    clicks only — dev-tail co-clicks must not leak into the neighbors."""
    ds = adressa.build_dataset(cfg, [events_file], dev_negatives=5,
                               news_graph_neighbors=4)
    nb = ds.news.neighbors
    assert nb is not None and nb.shape == (ds.meta.n_news, 4)
    assert nb.dtype == np.int32
    assert np.all(nb >= 0) and np.all(nb < ds.meta.n_news)
    # some article has a neighbor (the fixture has co-clicking users)
    assert nb.max() > 0

    # leakage check: rebuilding with train_fraction=1.0 (everything train)
    # must produce a graph with AT LEAST as many edges; with a tiny
    # train_fraction the graph must be strictly sparser
    ds_all = adressa.build_dataset(cfg, [events_file], dev_negatives=5,
                                   news_graph_neighbors=4,
                                   train_fraction=1.0)
    ds_tiny = adressa.build_dataset(cfg, [events_file], dev_negatives=5,
                                    news_graph_neighbors=4,
                                    train_fraction=0.05)
    edges = lambda a: int((a > 0).sum())
    assert edges(ds_all.news.neighbors) >= edges(nb)
    assert edges(ds_tiny.news.neighbors) < edges(ds_all.news.neighbors)
