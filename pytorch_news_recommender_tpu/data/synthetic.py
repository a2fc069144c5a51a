"""Synthetic MIND-like dataset with planted topical structure.

Serves the role the reference's ``small_train``/``small_dev`` demo split plays
as a de-facto fixture (``MIND_2020/config.py:14-15``, ``run_demo.py``), but
generated deterministically so tests and benchmarks need no external data.

Structure: each news belongs to a topic; its title/abstract words are drawn
from a topic-specific slice of the vocabulary. Each user prefers a couple of
topics; their history and clicked candidates come from preferred topics while
negatives are drawn uniformly. A working model should therefore push
impression AUC well above 0.5 within a few hundred steps.
"""

from __future__ import annotations

import numpy as np

from pytorch_news_recommender_tpu.config import ArtifactMeta, DataConfig
from pytorch_news_recommender_tpu.data.dataset import (
    DevData,
    NewsFeatures,
    RecDataset,
    TrainData,
)


def generate(
    cfg: DataConfig,
    seed: int = 0,
    n_news: int = 400,
    vocab_size: int = 600,
    n_topics: int = 8,
    n_categories: int = 8,
    n_subcategories: int = 16,
    n_train: int = 2048,
    n_dev: int = 256,
    n_test: int = 0,
    dev_cands_range: tuple[int, int] = (5, 30),
) -> RecDataset:
    rng = np.random.default_rng(seed)
    H, L_t, L_a = cfg.history_len, cfg.n_words_title, cfg.n_words_abst
    K = cfg.sample_size

    # --- news (row 0 = pad) ---
    topics = rng.integers(0, n_topics, size=n_news + 1)
    topics[0] = 0
    words_per_topic = (vocab_size - 1) // n_topics

    def draw_words(topic, length, fill_frac=0.7):
        n_fill = max(1, int(length * fill_frac))
        base = 1 + topic * words_per_topic
        w = rng.integers(base, base + words_per_topic, size=n_fill)
        out = np.zeros(length, dtype=np.int32)
        out[:n_fill] = w
        return out

    title = np.zeros((n_news + 1, L_t), dtype=np.int32)
    abst = np.zeros((n_news + 1, L_a), dtype=np.int32)
    categ = np.zeros(n_news + 1, dtype=np.int32)
    subcateg = np.zeros(n_news + 1, dtype=np.int32)
    for i in range(1, n_news + 1):
        title[i] = draw_words(topics[i], L_t)
        abst[i] = draw_words(topics[i], L_a)
        categ[i] = 1 + topics[i] % (n_categories - 1)
        subcateg[i] = 1 + topics[i] % (n_subcategories - 1)

    news_by_topic = [np.where(topics[1:] == t)[0] + 1 for t in range(n_topics)]

    def sample_user():
        prefs = rng.choice(n_topics, size=2, replace=False)
        hist_len = int(rng.integers(cfg.min_history, H + 1))
        pool = np.concatenate([news_by_topic[p] for p in prefs])
        hist = rng.choice(pool, size=hist_len)
        browsed = np.zeros(H, dtype=np.int32)
        browsed[H - hist_len:] = hist  # most-recent last, left-padded
        return prefs, pool, browsed

    # --- train: 1 positive + K uniform negatives, positive at slot 0 ---
    tr_browsed = np.zeros((n_train, H), dtype=np.int32)
    tr_cands = np.zeros((n_train, 1 + K), dtype=np.int32)
    for i in range(n_train):
        _, pool, browsed = sample_user()
        tr_browsed[i] = browsed
        tr_cands[i, 0] = rng.choice(pool)
        tr_cands[i, 1:] = rng.integers(1, n_news + 1, size=K)

    def make_eval(m: int, with_labels: bool) -> DevData:
        browsed = np.zeros((m, H), dtype=np.int32)
        cand_chunks, label_chunks, offsets = [], [], [0]
        for i in range(m):
            _, pool, b = sample_user()
            browsed[i] = b
            c = int(rng.integers(*dev_cands_range))
            n_pos = max(1, int(rng.integers(1, max(2, c // 4))))
            pos = rng.choice(pool, size=n_pos)
            neg = rng.integers(1, n_news + 1, size=c - n_pos)
            cands = np.concatenate([pos, neg]).astype(np.int32)
            labels = np.concatenate(
                [np.ones(n_pos, np.int8), np.zeros(c - n_pos, np.int8)])
            perm = rng.permutation(c)
            cand_chunks.append(cands[perm])
            label_chunks.append(labels[perm] if with_labels
                                else np.zeros(c, np.int8))
            offsets.append(offsets[-1] + c)
        return DevData(
            browsed_ids=browsed,
            cand_flat=np.concatenate(cand_chunks),
            label_flat=np.concatenate(label_chunks),
            offsets=np.asarray(offsets, dtype=np.int64),
        )

    dev = make_eval(n_dev, with_labels=True)
    test = make_eval(n_test, with_labels=False) if n_test else None

    meta = ArtifactMeta(
        n_words=vocab_size,
        n_news=n_news + 1,
        category_nums=n_categories,
        subcategory_nums=n_subcategories,
        entity_nums=0,
        n_train_samples=n_train,
        n_dev_impressions=n_dev,
        n_test_impressions=n_test,
    )
    return RecDataset(
        news=NewsFeatures(title=title, abst=abst, categ=categ, subcateg=subcateg),
        train=TrainData(browsed_ids=tr_browsed, candidate_ids=tr_cands),
        dev=dev,
        test=test,
        meta=meta,
    )
