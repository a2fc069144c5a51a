"""NRMS-BERT: precomputed per-news BERT vectors as the news tower.

Semantics of the reference's wired-in top-level model
``MIND_2020/model/nrms.py:216-365`` (the published dev-AUC-0.672 /
test-AUC-0.6455 run, ``res_logs.md:5``):

* news tower = TRAINABLE per-news vector table initialized from precomputed
  BERT sentence embeddings (``nn.Embedding.from_pretrained(..., freeze=False)``,
  ``nrms.py:222-224``) -> Linear(bert_dim, bert_dim) -> dropout
  (``nrms.py:225-256``);
* user tower = mask-aware MHSA over browsed vectors + additive attention with
  the large query dim (``nrms.py:258-272``, ``query_vector_dim_large``);
* dot-product scoring with ``-1e9`` on padded candidates
  (``nrms.py:362-364``).

TPU-first: the trainable ``[N, bert_dim]`` table is a parameter named
``bert_embedding/embedding`` so the mesh partition rules row-shard it over the
``model`` axis (``parallel/mesh.py``) — on a pod slice the lookup compiles to
an all-gather over ICI. With ``bert_trainable=False`` the table stays a
device-resident feature (no parameter memory), which is the serving mode.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import UserEncoder
from pytorch_news_recommender_tpu.ops.attention import dot_product_scores


class BertEmbedding(nn.Module):
    """Per-news vector table, optionally trainable.

    When trainable, the parameter is initialized by COPYING the provided
    feature table at ``init`` time (the functional analogue of torch's
    ``Embedding.from_pretrained(freeze=False)``); afterwards the checkpointed
    parameter is the source of truth and the feature table is only used for
    its ids.
    """

    trainable: bool = True

    @nn.compact
    def __call__(self, ids: jax.Array, table: jax.Array) -> jax.Array:
        if self.trainable:
            table = self.param(
                "embedding", lambda key: jnp.asarray(table, jnp.float32))
        return jnp.take(table, ids, axis=0)


class NRMSBert(RecModel):
    """BERT-vector news tower + attention user tower + dot-product scores."""

    cfg: ModelConfig

    FEAT_KEYS = ("bert",)

    def setup(self):
        c = self.cfg
        self.bert_embedding = BertEmbedding(trainable=c.bert_trainable)
        self.news_dense = nn.Dense(
            c.bert_embed_size, dtype=jnp.dtype(c.compute_dtype))
        self.news_dropout = nn.Dropout(c.dropout)
        self.user_encoder = UserEncoder(
            model_dim=c.bert_embed_size,
            num_heads=c.user_heads_num,
            query_dim=c.query_vector_dim_large,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
        )

    # The tower owns a trainable per-news table, so it encodes by ID (no
    # word axis -> nothing to length-bucket; feat_trunc is ignored).
    LENGTH_SPLIT_OK = False

    def encode_news_ids(self, ids: jax.Array, news_feats: Batch,
                        deterministic: bool = True,
                        feat_trunc=None) -> jax.Array:
        vec = self.bert_embedding(ids, news_feats["bert"])
        vec = self.news_dense(vec.astype(jnp.dtype(self.cfg.compute_dtype)))
        return self.news_dropout(vec, deterministic=deterministic)

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        """Feature-only path (serving with a frozen external table): applies
        the dense head directly to provided BERT rows."""
        vec = self.news_dense(
            feats["bert"].astype(jnp.dtype(self.cfg.compute_dtype)))
        return self.news_dropout(vec, deterministic=deterministic)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
