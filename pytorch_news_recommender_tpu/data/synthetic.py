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
    bert_dim: int = 0,
    n_users: int = 0,
    n_neighbors: int = 0,
    n_entities: int = 0,
    entities_per_news: int = 4,
    entity_dim: int = 0,
    popularity_skew: float = 1.0,
    title_len: tuple[float, float] | None = None,
    abst_len: tuple[float, float] | None = None,
) -> RecDataset:
    """``popularity_skew`` > 0 draws clicks Zipf-like (weight ~ 1/rank^a)
    within each topic pool, matching MIND's heavy-tailed click popularity —
    this is what makes batch news-deduplication (``loader.dedup_batch``)
    representative; 0 = uniform.

    ``title_len``/``abst_len`` = (mean, std) draw per-news true token counts
    from a clipped normal instead of the fixed 70% fill — MIND titles
    average ~11.5 words against the fixed 20-slot padding (MIND paper §3 /
    reference ``config.py:30``), which is what makes length-bucketed
    encoding (``loader.LengthSplit``) representative."""
    rng = np.random.default_rng(seed)
    H, L_t, L_a = cfg.history_len, cfg.n_words_title, cfg.n_words_abst
    K = cfg.sample_size

    # --- news (row 0 = pad) ---
    topics = rng.integers(0, n_topics, size=n_news + 1)
    topics[0] = 0
    words_per_topic = (vocab_size - 1) // n_topics

    def draw_words(topic, length, fill_frac=0.7, dist=None):
        if dist is not None:
            mean, std = dist
            n_fill = int(np.clip(round(rng.normal(mean, std)), 1, length))
        else:
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
        title[i] = draw_words(topics[i], L_t, dist=title_len)
        abst[i] = draw_words(topics[i], L_a, dist=abst_len)
        categ[i] = 1 + topics[i] % (n_categories - 1)
        subcateg[i] = 1 + topics[i] % (n_subcategories - 1)

    # optional per-news BERT-like vectors: topic centroid + noise (plays the
    # role of the reference's bert-as-service sentence vectors,
    # ``data_processor.py:45-65``)
    bert = None
    if bert_dim:
        centroids = rng.normal(size=(n_topics, bert_dim))
        bert = (centroids[topics] + 0.3 * rng.normal(
            size=(n_news + 1, bert_dim))).astype(np.float32)
        bert[0] = 0.0

    news_by_topic = [np.where(topics[1:] == t)[0] + 1 for t in range(n_topics)]
    # Zipf-like click weights per topic pool (popular news dominate clicks)
    weights_by_topic = []
    for pool in news_by_topic:
        if popularity_skew > 0 and len(pool):
            w = 1.0 / np.arange(1, len(pool) + 1) ** popularity_skew
            weights_by_topic.append(w / w.sum())
        else:
            weights_by_topic.append(None)

    def draw_clicks(prefs, size):
        """Sample clicked news from the union of preferred-topic pools with
        per-topic popularity weights."""
        pool = np.concatenate([news_by_topic[p] for p in prefs])
        if popularity_skew > 0:
            w = np.concatenate([weights_by_topic[p] for p in prefs])
            w = w / w.sum()
            return rng.choice(pool, size=size, p=w)
        return rng.choice(pool, size=size)

    # optional per-news entity ids (topic-clustered, like WikiData entities
    # from the MIND pipeline) + a pretrained-style entity matrix
    entity = None
    entity_embeddings = None
    if n_entities:
        ents_per_topic = max(1, n_entities // n_topics)
        entity = np.zeros((n_news + 1, entities_per_news), dtype=np.int32)
        for i in range(1, n_news + 1):
            base = 1 + (topics[i] * ents_per_topic) % n_entities
            k = int(rng.integers(1, entities_per_news + 1))
            entity[i, :k] = ((base + rng.integers(0, ents_per_topic, size=k)
                              - 1) % n_entities) + 1
        dim = entity_dim or 32
        entity_embeddings = rng.standard_normal(
            (n_entities + 1, dim)).astype(np.float32)
        entity_embeddings[0] = 0.0

    # optional co-click-style neighbor lists: same-topic news (plays the role
    # of an offline news-news graph for the GNN family); row 0 = pad news.
    neighbors = None
    if n_neighbors:
        neighbors = np.zeros((n_news + 1, n_neighbors), dtype=np.int32)
        for i in range(1, n_news + 1):
            pool = news_by_topic[topics[i]]
            neighbors[i] = rng.choice(pool, size=n_neighbors)

    # optional persistent user identities (uid 0 = pad/unknown); each user has
    # fixed topic preferences, so LSTUR-style long-term user embeddings have
    # signal to learn.
    user_prefs = None
    if n_users:
        user_prefs = [rng.choice(n_topics, size=2, replace=False)
                      for _ in range(n_users + 1)]

    def sample_user():
        if n_users:
            uid = int(rng.integers(1, n_users + 1))
            prefs = user_prefs[uid]
        else:
            uid = 0
            prefs = rng.choice(n_topics, size=2, replace=False)
        hist_len = int(rng.integers(cfg.min_history, H + 1))
        hist = draw_clicks(prefs, hist_len)
        browsed = np.zeros(H, dtype=np.int32)
        browsed[H - hist_len:] = hist  # most-recent last, left-padded
        return uid, prefs, browsed

    # --- train: 1 positive + K uniform negatives, positive at slot 0 ---
    tr_browsed = np.zeros((n_train, H), dtype=np.int32)
    tr_cands = np.zeros((n_train, 1 + K), dtype=np.int32)
    tr_users = np.zeros(n_train, dtype=np.int32)
    for i in range(n_train):
        uid, prefs, browsed = sample_user()
        tr_browsed[i] = browsed
        tr_users[i] = uid
        tr_cands[i, 0] = draw_clicks(prefs, 1)[0]
        tr_cands[i, 1:] = rng.integers(1, n_news + 1, size=K)

    def make_eval(m: int, with_labels: bool) -> DevData:
        browsed = np.zeros((m, H), dtype=np.int32)
        user_ids = np.zeros(m, dtype=np.int32)
        cand_chunks, label_chunks, offsets = [], [], [0]
        for i in range(m):
            uid, prefs, b = sample_user()
            browsed[i] = b
            user_ids[i] = uid
            c = int(rng.integers(*dev_cands_range))
            n_pos = max(1, int(rng.integers(1, max(2, c // 4))))
            pos = draw_clicks(prefs, n_pos)
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
            user_ids=user_ids if n_users else None,
        )

    dev = make_eval(n_dev, with_labels=True)
    test = make_eval(n_test, with_labels=False) if n_test else None

    meta = ArtifactMeta(
        n_words=vocab_size,
        n_news=n_news + 1,
        category_nums=n_categories,
        subcategory_nums=n_subcategories,
        entity_nums=(n_entities + 1) if n_entities else 0,
        n_users=(n_users + 1) if n_users else 0,
        n_train_samples=n_train,
        n_dev_impressions=n_dev,
        n_test_impressions=n_test,
    )
    return RecDataset(
        news=NewsFeatures(title=title, abst=abst, categ=categ,
                          subcateg=subcateg, bert=bert, entity=entity,
                          neighbors=neighbors),
        train=TrainData(browsed_ids=tr_browsed, candidate_ids=tr_cands,
                        user_ids=tr_users if n_users else None),
        dev=dev,
        test=test,
        meta=meta,
        entity_embeddings=entity_embeddings,
    )
