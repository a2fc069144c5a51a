"""Listwise re-ranker: two towers + a transformer interaction head over the
candidate list.

Semantics of the reference ``MIND_2020/model/list_rank.py:131-295``:

* news tower = FROZEN precomputed news vectors (BERT sentence embeddings,
  ``freeze=True`` — ``list_rank.py:166-168``) concat category + subcategory
  embeddings -> Dense(title_size) + GELU + dropout
  (``list_rank.py:170-205``; ``title_size=512``, ``config.py:66``);
* user tower = MHSA + positionwise-FFN + additive attention (LARGE query dim)
  over encoded browsed news (``list_rank.py:131-156``);
* interaction head = per-candidate concat[user | cand] -> LayerNorm ->
  Dense(2D -> D) + GELU -> zero out padded candidates -> transformer encoder
  block over the CANDIDATE LIST axis (heads=``list_num_heads``) -> Linear ->
  scalar score, ``-1e9`` on pads (``list_rank.py:250-295``).
  Training uses a longer candidate list (``sample_size=15``,
  ``run_v0.py:44-45``) so the list attention has context.

Departures from the reference (improvements): the user tower is mask-aware
(reference passes ``attn_masks=None``, ``list_rank.py:263``), and
``list_layers`` stacks the interaction block (reference hardcodes one).

TPU notes: the interaction head runs over the candidate axis (<=300), which
fits VMEM comfortably; scoring is NOT factorizable into a dot product, but
the cached two-tower path still applies — news vectors are encoded once per
eval and only the cheap interaction head runs per impression.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import (
    MultiHeadSelfAttention,
    PadEmbedding,
    PositionwiseFeedForward,
    TransformerEncoderBlock,
)
from pytorch_news_recommender_tpu.ops.attention import NEG_INF


class ListRankUserEncoder(nn.Module):
    """MHSA + FFN + additive attention (``list_rank.py:131-156``)."""

    model_dim: int
    num_heads: int
    query_dim: int
    dropout: float
    compute_dtype: str

    @nn.compact
    def __call__(self, news_vecs: jax.Array, mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        h = MultiHeadSelfAttention(self.num_heads, self.model_dim,
                                   self.compute_dtype, name="mhsa")(
            news_vecs, mask)
        h = PositionwiseFeedForward(self.model_dim, self.dropout,
                                    self.compute_dtype, name="ffn")(
            h, deterministic=deterministic)
        from pytorch_news_recommender_tpu.ops import attention as A
        w = self.param("aw", nn.initializers.xavier_uniform(),
                       (self.model_dim, self.query_dim))
        b = self.param("ab", nn.initializers.zeros, (self.query_dim,))
        q = self.param("aq",
                       lambda k, s: jax.random.uniform(k, s, jnp.float32, -1, 1),
                       (self.query_dim,))
        cd = jnp.dtype(self.compute_dtype)
        return A.additive_attention(h.astype(cd), w.astype(cd), b.astype(cd),
                                    q.astype(cd), mask)


class ListRank(RecModel):
    """Two-tower + candidate-list transformer re-ranker."""

    cfg: ModelConfig

    FEAT_KEYS = ("bert", "categ", "subcateg")

    def setup(self):
        c = self.cfg
        D = c.list_title_size
        self.category_embedding = PadEmbedding(
            c.category_nums, c.cate_embed_size, c.compute_dtype)
        self.subcategory_embedding = PadEmbedding(
            c.subcategory_nums, c.cate_embed_size, c.compute_dtype)
        self.news_dense = nn.Dense(D, dtype=jnp.dtype(c.compute_dtype))
        self.news_dropout = nn.Dropout(c.dropout)
        self.user_encoder = ListRankUserEncoder(
            model_dim=D, num_heads=c.user_heads_num,
            query_dim=c.query_vector_dim_large, dropout=c.dropout,
            compute_dtype=c.compute_dtype)
        self.norm = nn.LayerNorm(dtype=jnp.dtype(c.compute_dtype))
        self.iter_dense = nn.Dense(D, dtype=jnp.dtype(c.compute_dtype))
        self.blocks = [
            TransformerEncoderBlock(
                num_heads=c.list_num_heads, model_dim=D, ff_dim=c.list_ff_dim,
                dropout=c.dropout, compute_dtype=c.compute_dtype,
                name=f"block{i}")
            for i in range(c.list_layers)
        ]
        self.fc = nn.Dense(1, dtype=jnp.dtype(c.compute_dtype))

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        cd = jnp.dtype(self.cfg.compute_dtype)
        parts = [
            feats["bert"].astype(cd),   # frozen vectors: plain feature input
            self.category_embedding(feats["categ"]),
            self.subcategory_embedding(feats["subcateg"]),
        ]
        vec = nn.gelu(self.news_dense(jnp.concatenate(parts, axis=-1)))
        return self.news_dropout(vec, deterministic=deterministic)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        cand_mask = (cand_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask, deterministic)

        S = cand_vecs.shape[1]
        user_rep = jnp.broadcast_to(user_vec[:, None, :],
                                    (*cand_vecs.shape[:2], user_vec.shape[-1]))
        ui = jnp.concatenate([user_rep, cand_vecs], axis=-1)     # [B, S, 2D]
        ui = nn.gelu(self.iter_dense(self.norm(ui)))             # [B, S, D]
        ui = ui * cand_mask[..., None]                           # zero pads
        for block in self.blocks:
            ui = block(ui, cand_mask, deterministic=deterministic)
        scores = self.fc(ui)[..., 0].astype(jnp.float32)
        return jnp.where(cand_mask > 0, scores, NEG_INF)
