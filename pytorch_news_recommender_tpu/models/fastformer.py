"""Fastformer: additive-attention transformer news recommender (Wu et al.
2021, arXiv:2108.09084 — "Fastformer: Additive Attention Can Be All You
Need", evaluated on MIND in the paper).

An extension family (the reference repo has nothing like it): next to the
quadratic-attention NRMS tower, Fastformer models token interactions with
GLOBAL additive attention — a learned softmax pools the query rows into one
global query, which modulates the keys elementwise; a second softmax pools
the modulated keys into a global key, which modulates the values. Cost is
LINEAR in sequence length and consists entirely of ``[.., L, D] x [D, D]``
matmuls + elementwise ops + two masked softmaxes over ``L``.

TPU notes. This family is deliberately kernel-free: there is no ``L x L``
score matrix anywhere, so the whole layer is XLA-fusible dense work that
rides the MXU at full ``D`` contraction width — the padding-tax analysis in
docs/DESIGN.md (per-head ``dh``-contraction dots are the NRMS bottleneck at
reference dims) does not apply. Masked softmax logits accumulate in f32
(``preferred_element_type``) like the rest of the codebase; the towers obey
the standard RecModel contract, so batch dedup, length-bucketed encoding
(exact: every softmax is masked on ``ids != 0``), two-tower cached eval,
and the mesh shardings all apply unchanged.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import (
    AdditiveAttention,
    WordEmbedding,
    _dtype,
)
from pytorch_news_recommender_tpu.ops.attention import NEG_INF, dot_product_scores


def _head_softmax(logits: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    """``logits [..., L, H]`` -> softmax over ``L`` with ``mask [..., L]``."""
    if mask is not None:
        logits = jnp.where(mask[..., None] > 0, logits, NEG_INF)
    return jax.nn.softmax(logits, axis=-2)


class FastformerLayer(nn.Module):
    """One multi-head Fastformer block (paper §3.2) with LayerNorm."""

    num_heads: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        D, H = x.shape[-1], self.num_heads
        assert D % H == 0, (D, H)
        dh = D // H
        cd = _dtype(self.compute_dtype)
        scale = 1.0 / jnp.sqrt(dh).astype(cd)
        xc = x.astype(cd)

        def heads(name):
            y = nn.Dense(D, dtype=cd, name=name)(xc)
            return y.reshape(*y.shape[:-1], H, dh)          # [..., L, H, dh]

        q, k, v = heads("query"), heads("key"), heads("value")

        # global query: per-head additive attention over the query rows
        wq = self.param("wq", nn.initializers.xavier_uniform(), (H, dh))
        alpha = _head_softmax(
            jnp.einsum("...lhd,hd->...lh", q, wq.astype(cd),
                       preferred_element_type=jnp.float32) * scale, mask)
        g = jnp.einsum("...lh,...lhd->...hd", alpha.astype(cd), q,
                       preferred_element_type=jnp.float32).astype(cd)

        # global-query-modulated keys -> global key
        p = g[..., None, :, :] * k                          # [..., L, H, dh]
        wk = self.param("wk", nn.initializers.xavier_uniform(), (H, dh))
        beta = _head_softmax(
            jnp.einsum("...lhd,hd->...lh", p, wk.astype(cd),
                       preferred_element_type=jnp.float32) * scale, mask)
        kg = jnp.einsum("...lh,...lhd->...hd", beta.astype(cd), p,
                        preferred_element_type=jnp.float32).astype(cd)

        # global-key-modulated values, output transform, query residual
        u = (kg[..., None, :, :] * v).reshape(*x.shape[:-1], D)
        r = nn.Dense(D, dtype=cd, name="out")(u) + q.reshape(*x.shape[:-1], D)
        return nn.LayerNorm(dtype=cd, name="norm")(r)


class _Tower(nn.Module):
    """Fastformer stack + additive-attention pooling."""

    num_heads: int
    num_layers: int
    query_dim: int
    dropout: float
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None,
                 deterministic: bool = True) -> jax.Array:
        for i in range(self.num_layers):
            x = FastformerLayer(self.num_heads, self.compute_dtype,
                                name=f"layer{i}")(x, mask, deterministic)
            x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return AdditiveAttention(self.query_dim, self.compute_dtype,
                                 name="pool")(x, mask)


class Fastformer(RecModel):
    """Title-only Fastformer news + user towers, dot-product scoring."""

    cfg: ModelConfig

    FEAT_KEYS = ("title",)

    def setup(self):
        c = self.cfg
        self.word_embedding = WordEmbedding(
            c.n_words, c.word_embed_size, c.compute_dtype,
            trainable=not c.freeze_word_embeddings,
            embedding_lookup=c.embedding_lookup,
            a2a_capacity_factor=c.a2a_capacity_factor)
        self.embed_dropout = nn.Dropout(c.dropout)
        self.news_tower = _Tower(
            c.num_attention_heads, c.fastformer_layers, c.query_vector_dim,
            c.dropout, c.compute_dtype)
        self.user_tower = _Tower(
            c.user_heads_num, c.fastformer_layers, c.query_vector_dim,
            0.0, c.compute_dtype)

    # ---- two-tower serving API (same surface as NRMS) ----
    def encode_news(self, title_ids: jax.Array,
                    deterministic: bool = True) -> jax.Array:
        mask = (title_ids != 0).astype(jnp.float32)
        x = self.word_embedding(title_ids, mask)
        x = self.embed_dropout(x, deterministic=deterministic)
        return self.news_tower(x, mask, deterministic)

    def encode_user(self, browsed_vecs: jax.Array,
                    mask: jax.Array) -> jax.Array:
        return self.user_tower(browsed_vecs, mask, True)

    def score(self, user_vec: jax.Array, cand_vecs: jax.Array,
              cand_mask: jax.Array | None = None) -> jax.Array:
        return dot_product_scores(user_vec, cand_vecs, cand_mask)

    # ---- RecModel contract ----
    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        return self.encode_news(feats["title"], deterministic)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_tower(browsed_vecs, hist_mask, True)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
