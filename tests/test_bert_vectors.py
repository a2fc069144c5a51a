"""Offline BERT news-vector generation (reference bert-as-service pipeline,
``data_processor.py:45-65``) — exercised with a tiny randomly-initialized
local BERT so no network / pretrained weights are needed."""

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from pytorch_news_recommender_tpu.data.bert_vectors import (  # noqa: E402
    encode_news_table, encode_texts,
)
from pytorch_news_recommender_tpu.data.mind import NewsTable  # noqa: E402

VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "the", "a", "news", "story", "about", "sports", "finance",
         "rocket", "launch", "win", "##s"]


@pytest.fixture(scope="module")
def bert(tmp_path_factory):
    d = tmp_path_factory.mktemp("tiny_bert")
    (d / "vocab.txt").write_text("\n".join(VOCAB))
    tok = transformers.BertTokenizer(str(d / "vocab.txt"))
    cfg = transformers.BertConfig(
        vocab_size=len(VOCAB), hidden_size=32, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=37,
        max_position_embeddings=64)
    import torch
    torch.manual_seed(0)
    model = transformers.BertModel(cfg)
    return model, tok


def test_encode_texts_shapes_and_determinism(bert):
    model, tok = bert
    texts = ["the news story", "rocket launch wins", ""]
    v1 = encode_texts(texts, model, tok, batch_size=2)
    v2 = encode_texts(texts, model, tok, batch_size=3)
    assert v1.shape == (3, 32)
    # batching must not change results (masked mean ignores padding)
    np.testing.assert_allclose(v1, v2, atol=1e-5)


def test_encode_news_table_layout(bert):
    model, tok = bert

    news = NewsTable()
    news.index = {"N1": 1, "N2": 2}
    news.ids = ["N1", "N2"]
    news.title = ["the sports story", "finance news"]
    news.abstract = ["a story about sports", ""]  # N2: missing abstract

    emb = encode_news_table(news, model, tok)
    assert emb.shape == (3, 32)
    np.testing.assert_array_equal(emb[0], 0.0)  # zero pad row 0

    # missing abstract falls back to the title (reference ffill,
    # data_processor.py:52): N2 row == its title vector
    tv = encode_texts(["finance news"], model, tok)[0]
    np.testing.assert_allclose(emb[2], tv, atol=1e-5)

    # N1 is the title/abstract average
    t1 = encode_texts(["the sports story"], model, tok)[0]
    a1 = encode_texts(["a story about sports"], model, tok)[0]
    np.testing.assert_allclose(emb[1], (t1 + a1) / 2, atol=1e-5)
