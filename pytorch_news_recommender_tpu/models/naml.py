"""NAML-style multi-view news encoder: title + abstract attention towers with
shared weights, plus category / subcategory embeddings.

Semantics of the reference ``MIND_2020/model/nrms_naml.py:100-256``:

* ONE word-embedding table and ONE (MHSA + additive-attention) tower shared
  between the title and abstract views (``nrms_naml.py:107-115`` reuses the
  same modules for both loops);
* category + subcategory embeddings with pad row 0
  (``nrms_naml.py:104-105``, ``cate_embed_size=100``);
* news vector = concat[title 300 | abstract 300 | categ 100 | subcateg 100]
  -> 800-d (= reference ``news_feature_size``, ``config.py:68``), with dropout
  (``nrms_naml.py:172-175``);
* user tower = LayerNorm over browsed vectors, MHSA + additive attention with
  the LARGE query dim (``query_vector_dim_large=400``,
  ``nrms_naml.py:179-188,207,243``);
* dot-product scoring with ``-1e9`` on padded candidates
  (``nrms_naml.py:252-256``).

Departure from the reference (improvement, not accident): the user tower is
mask-aware — the reference passes ``attn_masks=None`` (``nrms_naml.py:249``)
so pad history slots leak into user vectors; here pads are masked like the
mask-aware NRMS variant (``nrms.py:258-272``).

TPU-first: the whole batch's title AND abstract views run as two calls of one
batched tower (the reference loops per news slot in Python,
``nrms_naml.py:151-168``), and both views share the same fused Pallas
encoder kernel when enabled.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import (
    AttentionPoolTower,
    PadEmbedding,
    UserEncoder,
    WordEmbedding,
)
from pytorch_news_recommender_tpu.ops.attention import dot_product_scores

import flax.linen as nn


class NAML(RecModel):
    """Title+abstract+category multi-view news encoder with NRMS user tower."""

    cfg: ModelConfig

    FEAT_KEYS = ("title", "abst", "categ", "subcateg")

    def setup(self):
        c = self.cfg
        self.word_embedding = WordEmbedding(
            c.n_words, c.word_embed_size, c.compute_dtype,
            trainable=not c.freeze_word_embeddings,
            embedding_lookup=c.embedding_lookup,
            a2a_capacity_factor=c.a2a_capacity_factor)
        # one tower shared by the title and abstract views
        self.text_tower = AttentionPoolTower(
            model_dim=c.word_embed_size,
            num_heads=c.num_attention_heads,
            query_dim=c.query_vector_dim,
            dropout=0.0,  # reference applies no intra-tower dropout here
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
        )
        self.category_embedding = PadEmbedding(
            c.category_nums, c.cate_embed_size, c.compute_dtype)
        self.subcategory_embedding = PadEmbedding(
            c.subcategory_nums, c.cate_embed_size, c.compute_dtype)
        self.news_dropout = nn.Dropout(c.dropout)
        self.news_dim = 2 * c.word_embed_size + 2 * c.cate_embed_size
        self.norm = nn.LayerNorm(dtype=jnp.dtype(c.compute_dtype))
        self.user_encoder = UserEncoder(
            model_dim=self.news_dim,
            num_heads=c.user_heads_num,
            query_dim=c.query_vector_dim_large,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
        )

    def _text_view(self, word_ids: jax.Array,
                   deterministic: bool) -> jax.Array:
        mask = (word_ids != 0).astype(jnp.float32)
        x = self.word_embedding(word_ids, mask)
        return self.text_tower(x, mask, deterministic)

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        title_vec = self._text_view(feats["title"], deterministic)
        abst_vec = self._text_view(feats["abst"], deterministic)
        categ_vec = self.category_embedding(feats["categ"])
        subcateg_vec = self.subcategory_embedding(feats["subcateg"])
        news_vec = jnp.concatenate(
            [title_vec, abst_vec, categ_vec, subcateg_vec], axis=-1)
        return self.news_dropout(news_vec, deterministic=deterministic)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(self.norm(browsed_vecs), hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
