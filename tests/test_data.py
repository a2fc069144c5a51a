"""Data-layer tests: synthetic generator, loaders, persistence roundtrip."""

import numpy as np

from pytorch_news_recommender_tpu.data import synthetic
from pytorch_news_recommender_tpu.data.dataset import RecDataset
from pytorch_news_recommender_tpu.data.loader import (
    eval_batches,
    pad_batch,
    train_batches,
)


def test_synthetic_shapes(cfg, dataset):
    d = cfg.data
    assert dataset.news.title.shape[1] == d.n_words_title
    assert (dataset.news.title[0] == 0).all()  # pad news row
    assert dataset.train.browsed_ids.shape[1] == d.history_len
    assert dataset.train.candidate_ids.shape[1] == d.group_size
    # every train sample has a real positive at slot 0
    assert (dataset.train.candidate_ids[:, 0] != 0).all()
    # word ids stay within the declared vocab
    assert dataset.news.title.max() < dataset.meta.n_words


def test_synthetic_determinism(cfg):
    a = synthetic.generate(cfg.data, seed=7, n_train=64, n_dev=16)
    b = synthetic.generate(cfg.data, seed=7, n_train=64, n_dev=16)
    np.testing.assert_array_equal(a.train.candidate_ids, b.train.candidate_ids)
    np.testing.assert_array_equal(a.dev.cand_flat, b.dev.cand_flat)


def test_train_batches_cover_epoch(dataset):
    rng = np.random.default_rng(0)
    seen = 0
    for batch in train_batches(dataset.train, 64, rng):
        assert batch["browsed_ids"].shape == (64, 50)
        seen += 64
    assert seen == (len(dataset.train) // 64) * 64


def test_eval_batches_bucketing(cfg, dataset):
    covered = set()
    for eb in eval_batches(dataset.dev, 16, cfg.data.eval_buckets):
        width = eb.batch["candidate_ids"].shape[1]
        assert width in cfg.data.eval_buckets
        assert (eb.n_candidates <= width).all()
        for j, imp in enumerate(eb.impression_ids):
            covered.add(int(imp))
            c_ids, _ = dataset.dev.impression(int(imp))
            n = eb.n_candidates[j]
            np.testing.assert_array_equal(
                eb.batch["candidate_ids"][j, :n], c_ids[:n])
            assert (eb.batch["candidate_ids"][j, n:] == 0).all()
    assert covered == set(range(len(dataset.dev)))


def test_pad_batch():
    b = {"x": np.arange(6).reshape(3, 2)}
    padded, n = pad_batch(b, 5)
    assert n == 3 and padded["x"].shape == (5, 2)
    np.testing.assert_array_equal(padded["x"][3], padded["x"][0])


def test_save_load_roundtrip(tmp_path, dataset):
    dataset.save(tmp_path / "ds")
    back = RecDataset.load(tmp_path / "ds")
    np.testing.assert_array_equal(back.news.title, dataset.news.title)
    np.testing.assert_array_equal(back.train.candidate_ids,
                                  dataset.train.candidate_ids)
    np.testing.assert_array_equal(back.dev.offsets, dataset.dev.offsets)
    assert back.meta == dataset.meta
