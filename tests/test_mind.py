"""MIND preprocessing pipeline tests on synthesized raw TSV fixtures.

Checks the reference-parity semantics documented in ``data/mind.py``:
digit-stripped tokenization on BOTH the vocab and id paths, 1-based
indexing with pad row 0, negative-sampling
group structure (positive at slot 0, no wraparound), history filters, ragged
dev labels, GloVe/entity matrix layout, and artifact roundtrip.
"""

import numpy as np
import pytest

from pytorch_news_recommender_tpu.config import DataConfig
from pytorch_news_recommender_tpu.data import mind
from pytorch_news_recommender_tpu.data.dataset import RecDataset

NEWS_TSV = "\n".join([
    # news_id, category, subcategory, title, abstract, url, t_ents, a_ents
    "N1\tsports\tfootball\tTeam wins big game 2020\tThe team won again\tu\t"
    '[{"WikidataId": "Q1"}]\t[]',
    "N2\tsports\tbasketball\tStar scores fifty points\tAmazing star game "
    "night\tu\t\t",
    "N3\tnews\tpolitics\tElection results are in\tThe election results "
    "surprised\tu\t" '[{"WikidataId": "Q2"}]\t[]',
    "N4\tnews\tworld\tGlobal summit ends early\tLeaders left the summit\tu\t\t",
    "N5\tfinance\tmarkets\tStocks rally on news\tMarkets moved higher "
    "today\tu\t\t",
]) + "\n"

# extra dev-only news to exercise the cross-split union
DEV_NEWS_TSV = NEWS_TSV + (
    "N6\tfinance\tmarkets\tBonds fall on rally news\tYields up as markets "
    "fell\tu\t\t\n")

TRAIN_BEHAVIORS = "\n".join([
    # impression_id, user_id, time, history, impressions
    "1\tU1\t11/11/2019\tN1 N2 N3 N4 N5\tN1-1 N2-0 N3-0 N4-0 N5-0 N2-0 N3-0",
    "2\tU2\t11/11/2019\tN1 N2\tN3-1 N4-0",        # history < 5 -> dropped
    "3\tU3\t11/11/2019\tN2 N3 N4 N5 N1\tN2-1 N1-0 N3-1 N4-0 N5-0",
]) + "\n"

DEV_BEHAVIORS = "\n".join([
    "1\tU1\t11/12/2019\tN1 N2 N3\tN4-1 N5-0 N6-0",
    "2\tU9\t11/12/2019\tN2\tN1-0 N3-1",
]) + "\n"

GLOVE = "\n".join(
    f"{w} " + " ".join(str(v) for v in vec)
    for w, vec in [
        ("team", [1.0, 0.0, 0.0, 0.0]),
        ("game", [0.0, 1.0, 0.0, 0.0]),
        ("results", [0.0, 0.0, 1.0, 0.0]),
    ]) + "\n"

ENTITY_VEC = "Q1\t" + "\t".join(["0.5"] * 4) + "\nQ2\t" + "\t".join(
    ["0.25"] * 4) + "\n"


@pytest.fixture()
def mind_dirs(tmp_path):
    train = tmp_path / "train"
    dev = tmp_path / "dev"
    for d, news, beh in [(train, NEWS_TSV, TRAIN_BEHAVIORS),
                         (dev, DEV_NEWS_TSV, DEV_BEHAVIORS)]:
        d.mkdir()
        (d / "news.tsv").write_text(news)
        (d / "behaviors.tsv").write_text(beh)
    (train / "entity_embedding.vec").write_text(ENTITY_VEC)
    (tmp_path / "glove.txt").write_text(GLOVE)
    return tmp_path


@pytest.fixture()
def cfg():
    return DataConfig(history_len=6, sample_size=2, min_history=3,
                      word_freq_threshold=2, entity_nums=3)


def test_vocab_and_tokenization(mind_dirs, cfg):
    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev")
    # vocab counts over digit-stripped lowercase text, threshold 2
    news = mind.NewsTable()
    news.add_split(mind_dirs / "train" / "news.tsv")
    news.add_split(mind_dirs / "dev" / "news.tsv")
    vocab = mind.build_vocab(news, 2)
    assert "game" in vocab and "news" in vocab
    assert "election" in vocab  # appears in title + abstract
    assert "2020" not in vocab  # digits deleted before counting
    assert ds.meta.n_words == len(vocab) + 1
    # title ids: row 0 is all-pad
    assert np.all(ds.news.title[0] == 0)
    # N1 title "Team wins big game 2020": only in-vocab words kept
    t1 = ds.news.title[1]
    assert vocab["team"] in t1 and vocab["game"] in t1


def test_id_conversion_digit_strips_like_vocab():
    """Alphanumeric tokens map to their digit-stripped word's id.

    Reference trace: ``clean_words`` (lowercase + digit deletion) overwrites
    the Title/Abstract dataframe columns (``data_processor.py:157-158``)
    BEFORE ``get_title_word_idxs`` tokenizes those same mutated columns
    (``data_processor.py:218-219``), so the reference's word-id sequences are
    built from digit-stripped text: "covid19" is id-mapped as "covid"
    (in-vocab), NOT dropped as an out-of-vocab token.
    """
    assert mind.tokenize("Covid19 Vaccine 2020") == ["covid", "vaccine"]
    vocab = {"covid": 1, "vaccine": 2}
    assert mind._to_ids("Covid19 vaccine rollout 2020", vocab, 4) == [1, 2, 0, 0]
    # both public aliases share the digit-strip semantics
    assert mind.tokenize_for_ids("abc123def") == mind.tokenize_for_vocab("abc123def") == ["abcdef"]


def test_news_union_and_dicts(mind_dirs, cfg):
    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev")
    assert ds.meta.n_news == 7  # 6 distinct news + pad
    # categories: sports, news, finance (+pad)
    assert ds.meta.category_nums == 4
    assert ds.meta.subcategory_nums == 6  # football, basketball, politics, world, markets (+pad)
    # dev-only news N6 got indexed
    assert ds.news.categ[6] == ds.news.categ[5]  # both finance


def test_train_sampling_structure(mind_dirs, cfg):
    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev")
    tr = ds.train
    # U2 dropped (history 2 < 3); U1 has 1 positive, U3 has 2 positives
    assert len(tr) == 3
    # every sample: positive at slot 0, group width 1+K
    assert tr.candidate_ids.shape == (3, 3)
    assert np.all(tr.candidate_ids[:, 0] > 0)
    # histories left-padded, most recent last
    row = tr.browsed_ids[0]
    assert row[-1] > 0
    assert row[0] == 0  # 5 clicks into length-6 window
    # user ids mapped
    assert tr.user_ids is not None and np.all(tr.user_ids > 0)


def test_negatives_no_wraparound(mind_dirs, cfg):
    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev")
    # U3 has 2 positives but only 3 negatives; second group gets the single
    # leftover negative + zero pad (reference slicing, no wraparound)
    groups = ds.train.candidate_ids[-2:]
    widths = (groups > 0).sum(axis=1)
    assert sorted(widths.tolist()) == [2, 3]


def test_dev_split_ragged(mind_dirs, cfg):
    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev")
    dev = ds.dev
    assert len(dev) == 2
    c0, y0 = dev.impression(0)
    assert list(y0) == [1, 0, 0]
    assert c0[0] == 4  # N4
    c1, y1 = dev.impression(1)
    assert list(y1) == [0, 1]
    assert dev.impression_keys is not None


def test_glove_and_entities(mind_dirs, cfg):
    ds = mind.build_dataset(
        cfg, mind_dirs / "train", mind_dirs / "dev",
        glove_path=mind_dirs / "glove.txt", word_embed_size=4)
    emb = ds.word_embeddings
    assert emb is not None and np.all(emb[0] == 0)
    news = mind.NewsTable()
    news.add_split(mind_dirs / "train" / "news.tsv")
    news.add_split(mind_dirs / "dev" / "news.tsv")
    vocab = mind.build_vocab(news, 2)
    np.testing.assert_allclose(emb[vocab["game"]], [0, 1, 0, 0])
    # entity matrix: zero row 0 + Q1, Q2
    assert ds.entity_embeddings is not None
    assert ds.entity_embeddings.shape == (3, 4)
    assert np.all(ds.entity_embeddings[0] == 0)
    # per-news entity ids: N1 -> Q1
    assert ds.news.entity is not None
    assert ds.news.entity[1, 0] == 1


def test_roundtrip_and_determinism(mind_dirs, cfg, tmp_path):
    out = tmp_path / "artifacts"
    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev",
                            glove_path=mind_dirs / "glove.txt",
                            word_embed_size=4, out_dir=out)
    ds2 = RecDataset.load(out)
    np.testing.assert_array_equal(ds.news.title, ds2.news.title)
    np.testing.assert_array_equal(ds.train.candidate_ids,
                                  ds2.train.candidate_ids)
    np.testing.assert_array_equal(ds.word_embeddings, ds2.word_embeddings)
    assert ds2.meta.n_users == ds.meta.n_users
    # preprocessing dictionaries round-trip (reference word_dict.csv /
    # entity_ids_dict.pkl equivalents)
    assert ds2.dicts is not None
    assert ds2.dicts == ds.dicts
    assert set(ds2.dicts) == {"word", "news", "category", "subcategory",
                              "user", "entity"}
    assert ds2.dicts["news"]["N1"] == 1
    assert "game" in ds2.dicts["word"]
    # same seed -> identical sampling
    ds3 = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev")
    np.testing.assert_array_equal(ds.train.candidate_ids,
                                  ds3.train.candidate_ids)


def _train_tiny(mind_dirs, cfg):
    import dataclasses

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.train.loop import Trainer

    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev",
                            glove_path=mind_dirs / "glove.txt",
                            word_embed_size=4)
    base = synthetic_config()
    full = dataclasses.replace(
        base,
        data=dataclasses.replace(cfg, eval_buckets=(4, 8)),
        model=dataclasses.replace(base.model, word_embed_size=4,
                                  num_attention_heads=2, user_heads_num=2),
        train=dataclasses.replace(base.train, batch_size=3,
                                  eval_batch_size=2),
    )
    trainer = Trainer(full, ds)
    state = trainer.init_state(seed=0)
    return full, ds, state


def test_fresh_news_ingestion(mind_dirs, cfg):
    """A news item that was NOT in the corpus can be tokenized with the
    persisted dictionaries, encoded, ingested, and scored (VERDICT r1 #3;
    reference artifacts: word_dict.csv ``data_processor.py:186-188``)."""
    from pytorch_news_recommender_tpu.serve import Recommender

    full, ds, state = _train_tiny(mind_dirs, cfg)
    rec = Recommender(full, ds, state.params, candidate_widths=(4, 8))

    rows = rec.tokenize_new_news("Election game tonight 2024",
                                 category="news", subcategory="politics",
                                 entities=["Q2", "Q404"])
    vocab = ds.dicts["word"]
    # pipeline semantics: digit-stripped, in-vocab only
    assert rows["title"][0] == vocab["election"]
    assert rows["title"][1] == vocab["game"]
    assert int(rows["categ"]) == ds.dicts["category"]["news"]
    assert rows["entity"][0] == ds.dicts["entity"]["Q2"]  # Q404 unknown

    vec = rec.encode_new_news("Election game tonight", category="news")
    assert vec.ndim == 1 and np.all(np.isfinite(vec))

    n_before = rec.n_news
    nid = rec.add_news("Election game tonight", category="news",
                       subcategory="politics")
    assert nid == n_before and rec.n_news == n_before + 1
    # the fresh id scores through both request paths immediately
    s = rec.score([1, 2, 3], [nid, 1, 2])
    assert s.shape == (3,) and np.all(np.isfinite(s))
    ids, scores = rec.top_k([1, 2, 3], k=4)
    assert np.all(ids < rec.n_news) and np.all(np.isfinite(scores))
    # grown feature tables carry the tokenized row
    np.testing.assert_array_equal(
        np.asarray(rec.news_feats["title"][nid]), rows["title"])


def test_fresh_news_http_roundtrip(mind_dirs, cfg):
    import http.client
    import json

    from pytorch_news_recommender_tpu.serve import Recommender
    from pytorch_news_recommender_tpu.server import RecommenderServer

    full, ds, state = _train_tiny(mind_dirs, cfg)
    rec = Recommender(full, ds, state.params, candidate_widths=(4, 8))
    srv = RecommenderServer(rec, port=0)
    srv.start(block=False)
    try:
        conn = http.client.HTTPConnection("127.0.0.1", srv.port, timeout=30)
        conn.request("POST", "/add_news", body=json.dumps(
            {"title": "Stocks rally again", "category": "finance",
             "subcategory": "markets"}))
        r = json.loads(conn.getresponse().read())
        nid = r["id"]
        assert nid == ds.news.n_news
        conn.request("POST", "/score", body=json.dumps(
            {"history": [1, 2, 3], "candidates": [nid, 1]}))
        r = json.loads(conn.getresponse().read())
        assert len(r["scores"]) == 2
        assert all(np.isfinite(s) for s in r["scores"])
    finally:
        srv.stop()


def test_mesh_add_news_growth(mind_dirs, cfg):
    """--mesh serving keeps the corpus cache row-sharded across an add_news
    block growth, and grown answers match the single-device recommender."""
    from pytorch_news_recommender_tpu.config import MeshConfig
    from pytorch_news_recommender_tpu.parallel.mesh import make_mesh
    from pytorch_news_recommender_tpu.serve import Recommender

    full, ds, state = _train_tiny(mind_dirs, cfg)
    rec = Recommender(full, ds, state.params, candidate_widths=(4, 8))
    mesh = make_mesh(MeshConfig())
    rec_m = Recommender(full, ds, state.params, mesh=mesh,
                        candidate_widths=(4, 8))
    n_dev = mesh.shape[mesh.axis_names[0]]
    # land the grown capacity on a mesh-divisible size so the re-shard
    # branch (serve.py grown()) actually runs
    grow = type(rec_m).GROW_BLOCK
    grow += (-(rec_m.n_news + grow)) % n_dev
    rec_m.GROW_BLOCK = rec.GROW_BLOCK = grow

    item = dict(title="Stocks rally again", category="finance",
                subcategory="markets")
    nid = rec.add_news(**item)
    nid_m = rec_m.add_news(**item)
    assert nid_m == nid
    assert rec_m.news_vecs.shape[0] % n_dev == 0
    # the grown cache is genuinely distributed, not replicated
    axis = mesh.axis_names[0]
    spec = rec_m.news_vecs.sharding.spec
    assert spec[0] == axis, spec
    assert len(rec_m.news_vecs.sharding.device_set) == n_dev

    hist = [1, 2, 3]
    np.testing.assert_allclose(rec_m.score(hist, [nid, 1, 2]),
                               rec.score(hist, [nid, 1, 2]),
                               rtol=1e-4, atol=1e-5)
    ids_a, _ = rec.top_k(hist, k=4)
    ids_b, _ = rec_m.top_k(hist, k=4)
    assert [int(i) for i in ids_a] == [int(i) for i in ids_b]


def test_coclick_graph(mind_dirs, cfg):
    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev",
                            news_graph_neighbors=3)
    g = ds.news.neighbors
    assert g is not None and g.shape == (7, 3)
    assert np.all(g[0] == 0)
    # N1 co-clicked with N2..N5 in histories
    assert g[1, 0] > 0


def test_end_to_end_training(mind_dirs, cfg):
    """The tiny MIND artifacts drive a real Trainer step + evaluation."""
    import dataclasses

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.train.loop import Trainer

    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev",
                            glove_path=mind_dirs / "glove.txt",
                            word_embed_size=4)
    base = synthetic_config()
    full = dataclasses.replace(
        base,
        data=dataclasses.replace(cfg, eval_buckets=(4, 8)),
        model=dataclasses.replace(base.model, word_embed_size=4,
                                  num_attention_heads=2, user_heads_num=2),
        train=dataclasses.replace(base.train, batch_size=3, eval_batch_size=2),
    )
    trainer = Trainer(full, ds)
    state = trainer.init_state(seed=0)
    # pretrained GloVe rows landed in the model params
    w = np.asarray(
        state.params["news_encoder"]["word_embedding"]["embedding"])
    np.testing.assert_array_equal(w, ds.word_embeddings)
    import jax
    batch = {
        "browsed_ids": ds.train.browsed_ids,
        "candidate_ids": ds.train.candidate_ids,
        "user_ids": ds.train.user_ids,
    }
    state, metrics = trainer.run_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    m = trainer.evaluate(state)
    assert 0.0 <= m["auc"] <= 1.0


def test_fresh_news_gnn_isolated_node(mind_dirs, cfg):
    """GNN fresh-news ingestion: a fresh item has no co-click edges, so
    tokenization emits the all-pad ``neighbors`` row and the ingested
    vector equals the corpus levelwise encode of an ISOLATED node (title
    tower through the GAT gates with an empty aggregate)."""
    import dataclasses

    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.config import synthetic_config
    from pytorch_news_recommender_tpu.serve import Recommender
    from pytorch_news_recommender_tpu.train.loop import Trainer

    ds = mind.build_dataset(cfg, mind_dirs / "train", mind_dirs / "dev",
                            glove_path=mind_dirs / "glove.txt",
                            word_embed_size=4, news_graph_neighbors=2)
    assert ds.news.neighbors is not None
    base = synthetic_config()
    full = dataclasses.replace(
        base,
        data=dataclasses.replace(cfg, eval_buckets=(4, 8)),
        model=dataclasses.replace(base.model, name="gnn", word_embed_size=4,
                                  num_attention_heads=2, user_heads_num=2),
        train=dataclasses.replace(base.train, batch_size=3,
                                  eval_batch_size=2),
    )
    trainer = Trainer(full, ds)
    state = trainer.init_state(seed=0)
    rec = Recommender(full, ds, state.params, candidate_widths=(4, 8))

    rows = rec.tokenize_new_news("Election game tonight", category="news")
    assert "neighbors" in rows and not rows["neighbors"].any()

    vec = rec.encode_new_news("Election game tonight", category="news")
    # reference: append the fresh title to the tables with an all-pad
    # neighbor row and run the model's recursive id encode on it
    N = ds.news.n_news
    titles = jnp.concatenate(
        [jnp.asarray(ds.news.title), jnp.asarray(rows["title"])[None]], 0)
    neigh = jnp.concatenate(
        [jnp.asarray(ds.news.neighbors),
         jnp.zeros((1, ds.news.neighbors.shape[1]), jnp.int32)], 0)
    feats2 = dict(trainer.news_feats, title=titles, neighbors=neigh)
    ref = trainer.model.apply(
        {"params": state.params}, jnp.asarray([N]), feats2, True,
        method="encode_news_ids")
    np.testing.assert_allclose(vec, np.asarray(ref)[0], rtol=2e-4, atol=2e-4)

    nid = rec.add_news("Election game tonight", category="news")
    assert nid == N and rec.n_news == N + 1
    # all-pad neighbor row landed in the resident table; scoring works
    assert not np.asarray(rec.news_feats["neighbors"][nid]).any()
    s = rec.score([1, 2], [nid, 1])
    assert s.shape == (2,) and np.all(np.isfinite(s))
