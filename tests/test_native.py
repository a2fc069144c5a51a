"""Native (C++) preprocessing fast path: bit-identical to the Python path.

Both implementations follow the same splitmix64 hash-shuffle spec
(``data/mind.py`` docstring), so every output array must match EXACTLY —
not just structurally.
"""

import numpy as np
import pytest

from pytorch_news_recommender_tpu import native
from pytorch_news_recommender_tpu.config import DataConfig
from pytorch_news_recommender_tpu.data import mind

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture()
def fixture_dirs(tmp_path):
    # reuse the TSV fixtures from test_mind
    from tests.test_mind import (DEV_BEHAVIORS, DEV_NEWS_TSV, NEWS_TSV,
                                 TRAIN_BEHAVIORS)
    train = tmp_path / "train"
    dev = tmp_path / "dev"
    for d, news_txt, beh in [(train, NEWS_TSV, TRAIN_BEHAVIORS),
                             (dev, DEV_NEWS_TSV, DEV_BEHAVIORS)]:
        d.mkdir()
        (d / "news.tsv").write_text(news_txt)
        (d / "behaviors.tsv").write_text(beh)
    return tmp_path


@pytest.fixture()
def cfg():
    return DataConfig(history_len=6, sample_size=2, min_history=3,
                      word_freq_threshold=2)


def _indexes(fixture_dirs):
    news = mind.NewsTable()
    news.add_split(fixture_dirs / "train" / "news.tsv")
    news.add_split(fixture_dirs / "dev" / "news.tsv")
    users = mind.collect_users(
        [fixture_dirs / "train" / "behaviors.tsv",
         fixture_dirs / "dev" / "behaviors.tsv"])
    return news.index, users


def test_train_bit_identical(fixture_dirs, cfg):
    news_idx, users = _indexes(fixture_dirs)
    path = fixture_dirs / "train" / "behaviors.tsv"
    py = mind.build_train_samples(path, news_idx, users, cfg, seed=2020)
    browsed, cand, user = native.build_train_samples(
        path, news_idx, users, cfg.history_len, cfg.sample_size,
        cfg.min_history, 2020)
    np.testing.assert_array_equal(py.browsed_ids, browsed)
    np.testing.assert_array_equal(py.candidate_ids, cand)
    np.testing.assert_array_equal(py.user_ids, user)


def test_eval_bit_identical(fixture_dirs, cfg):
    news_idx, users = _indexes(fixture_dirs)
    path = fixture_dirs / "dev" / "behaviors.tsv"
    py = mind.build_eval_split(path, news_idx, users, cfg, with_labels=True)
    browsed, user, keys, offsets, cand_flat, label_flat = \
        native.build_eval_split(path, news_idx, users, cfg.history_len, True)
    np.testing.assert_array_equal(py.browsed_ids, browsed)
    np.testing.assert_array_equal(py.user_ids, user)
    np.testing.assert_array_equal(py.impression_keys, keys)
    np.testing.assert_array_equal(py.offsets, offsets)
    np.testing.assert_array_equal(py.cand_flat, cand_flat)
    np.testing.assert_array_equal(py.label_flat, label_flat)


def test_build_dataset_native_matches_python(fixture_dirs, cfg):
    ds_native = mind.build_dataset(cfg, fixture_dirs / "train",
                                   fixture_dirs / "dev", use_native=True)
    ds_py = mind.build_dataset(cfg, fixture_dirs / "train",
                               fixture_dirs / "dev", use_native=False)
    np.testing.assert_array_equal(ds_native.train.candidate_ids,
                                  ds_py.train.candidate_ids)
    np.testing.assert_array_equal(ds_native.dev.cand_flat, ds_py.dev.cand_flat)
    np.testing.assert_array_equal(ds_native.dev.label_flat,
                                  ds_py.dev.label_flat)


def test_batch_dedup_bit_identical():
    """Native runtime batcher must match np.unique(..., return_inverse=True)
    exactly (sorted ascending uniques with pad id 0 present, inverse ranks)."""
    if not native.available():
        import pytest
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    for _ in range(50):
        nb, nc = int(rng.integers(1, 512)), int(rng.integers(1, 64))
        hi = int(rng.integers(2, 3000))
        browsed = rng.integers(0, hi, size=(nb,)).astype(np.int32)
        cand = rng.integers(0, hi, size=(nc,)).astype(np.int32)
        u, uniq, bidx, cidx = native.batch_dedup(browsed, cand)
        ref_u, ref_inv = np.unique(
            np.concatenate([np.zeros(1, np.int32), browsed, cand]),
            return_inverse=True)
        assert u == len(ref_u)
        np.testing.assert_array_equal(uniq[:u], ref_u)
        np.testing.assert_array_equal(uniq[u:], 0)
        np.testing.assert_array_equal(bidx, ref_inv[1:1 + nb])
        np.testing.assert_array_equal(cidx, ref_inv[1 + nb:])


def test_dedup_batch_native_matches_numpy(monkeypatch):
    """loader.dedup_batch must produce identical batches with and without
    the native fast path."""
    from pytorch_news_recommender_tpu.data import loader
    rng = np.random.default_rng(3)
    batch = {
        "browsed_ids": rng.integers(0, 500, size=(64, 50)).astype(np.int32),
        "candidate_ids": rng.integers(0, 500, size=(64, 6)).astype(np.int32),
        "user_ids": rng.integers(0, 99, size=(64,)).astype(np.int32),
    }
    with_native = loader.dedup_batch(batch, buckets=(1024,))
    monkeypatch.setattr(native, "available", lambda: False)
    without = loader.dedup_batch(batch, buckets=(1024,))
    assert sorted(with_native) == sorted(without)
    for k in with_native:
        np.testing.assert_array_equal(with_native[k], without[k])


def test_tokenize_ids_bit_identical():
    """The C++ ASCII tokenizer + Python fallback must reproduce the Python
    id-conversion exactly: lowercase, digit DELETION (joining the flanks:
    'ab1cd' -> 'abcd'), \\w+ tokens, in-vocab filter, truncate+pad."""
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    from pytorch_news_recommender_tpu.data import mind

    vocab = {"covid": 1, "vaccine": 2, "abcd": 3, "team": 4, "big_win": 5,
             "ole": 6, "game": 7}
    texts = [
        "Covid19 vaccine rollout 2020",      # digit-stripped alnum tokens
        "ab1cd plays 99 the game",           # digits join flanks
        "Team BIG_WIN again, team!",         # underscore word char, repeats
        "",                                  # empty
        "12345",                             # digits only
        "sølvgutten Ole",               # non-ASCII -> fallback row
        "team " * 40,                        # truncation past length
    ]
    for length in (4, 20):
        got = mind.ids_matrix(texts, vocab, length, native_mod=native)
        expect = np.zeros((len(texts) + 1, length), np.int32)
        for i, t in enumerate(texts):
            expect[i + 1] = mind._to_ids(t, vocab, length)
        np.testing.assert_array_equal(got, expect)

    # the native call flags exactly the non-ASCII row for fallback
    ids, fb = native.tokenize_ids(texts, vocab, 8)
    assert list(np.nonzero(fb)[0]) == [5]


def test_build_dataset_tokenizes_native(fixture_dirs, cfg):
    """build_dataset's title/abstract matrices are identical with and
    without the native tokenizer (same fixture as the other parity tests)."""
    from pytorch_news_recommender_tpu.data import mind

    a = mind.build_dataset(cfg, fixture_dirs / "train",
                           fixture_dirs / "dev", use_native=True)
    b = mind.build_dataset(cfg, fixture_dirs / "train",
                           fixture_dirs / "dev", use_native=False)
    np.testing.assert_array_equal(a.news.title, b.news.title)
    np.testing.assert_array_equal(a.news.abst, b.news.abst)
