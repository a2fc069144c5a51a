"""LSTUR: CNN title news encoder + GRU short-term / embedding long-term user
encoder.

The reference file ``MIND_2020/model/lstur.py`` is non-functional as committed
(missing imports, undefined ``user``/``x``/``click_probability`` in
``Model.forward``, category embedding reused for subcategory —
``lstur.py:80-82,203-244``; see SURVEY.md §2.1). This is the REPAIRED
semantics, per the encoders that do exist:

* news tower (``lstur.py:34-101``): category + subcategory embeddings
  (pad row 0) concat a CNN title view — word embedding -> dropout -> 1-D conv
  (``num_filters=400``, kernel 3, SAME padding) -> ReLU -> dropout ->
  additive attention over word positions -> ``[num_filters]``;
  news dim = ``num_filters + 2*cate_embed_size`` (= reference
  ``news_encoder_size=600``, ``config.py:74``).
* user tower (``lstur.py:103-142``): GRU over the clicked-news sequence.
  ``long_short_term_method='ini'``: the long-term user embedding initializes
  the GRU hidden state; ``'con'``: a half-size GRU's final state is
  concatenated with a half-size user embedding. Unknown users (id 0, or
  batches without ``user_ids``) get a zero long-term vector — matching the
  LSTUR paper's masked-user training trick.
* dot-product scoring with ``-1e9`` on padded candidates.

TPU notes: the GRU runs as a ``flax.linen.scan`` over the 50-step history
(static length, masked carry updates for pad slots — histories are
left-padded so the final carry is the last real click), compiling to a single
fused XLA while-free loop. The CNN is an ``nn.Conv`` on ``[B*N, L, D]`` which
XLA maps onto the MXU as an implicit GEMM.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import (
    AdditiveAttention,
    PadEmbedding,
    WordEmbedding,
)
from pytorch_news_recommender_tpu.ops.attention import dot_product_scores


class CNNTitleEncoder(nn.Module):
    """Word embed -> dropout -> Conv1d -> ReLU -> dropout -> additive pool."""

    n_words: int
    word_embed_size: int
    num_filters: int
    kernel_size: int
    query_dim: int
    dropout: float
    compute_dtype: str
    freeze_embeddings: bool = False

    @nn.compact
    def __call__(self, word_ids: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        mask = (word_ids != 0).astype(jnp.float32)
        x = WordEmbedding(self.n_words, self.word_embed_size,
                          self.compute_dtype,
                          trainable=not self.freeze_embeddings,
                          name="word_embedding")(
            word_ids, mask)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        lead = x.shape[:-2]
        L = x.shape[-2]
        x2 = x.reshape(-1, L, self.word_embed_size)
        h = nn.Conv(self.num_filters, kernel_size=(self.kernel_size,),
                    padding="SAME", dtype=jnp.dtype(self.compute_dtype),
                    name="title_cnn")(x2)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        pooled = AdditiveAttention(self.query_dim, self.compute_dtype,
                                   name="title_attention")(
            h, mask.reshape(-1, L))
        return pooled.reshape(*lead, self.num_filters)


class MaskedGRU(nn.Module):
    """GRU over ``[B, T, D]`` whose carry only advances on valid steps."""

    features: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array,
                 init_carry: jax.Array) -> jax.Array:
        def step(cell, carry, inputs):
            xt, mt = inputs
            new_carry, _ = cell(carry, xt)
            # scan carries must keep one dtype: with f32 params and a bf16
            # carry the cell's output promotes to f32 (the bfloat16 crash
            # the Adressa battery caught on hardware) — pin it back
            new_carry = new_carry.astype(carry.dtype)
            carry = jnp.where(mt[:, None] > 0, new_carry, carry)
            return carry, ()

        scan = nn.scan(step, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        cell = nn.GRUCell(self.features, dtype=jnp.dtype(self.compute_dtype),
                          name="cell")
        final, _ = scan(cell, init_carry, (x, mask))
        return final


class LSTUR(RecModel):
    """CNN news tower + long-/short-term GRU user tower."""

    cfg: ModelConfig

    FEAT_KEYS = ("title", "categ", "subcateg")

    def setup(self):
        c = self.cfg
        self.category_embedding = PadEmbedding(
            c.category_nums, c.cate_embed_size, c.compute_dtype)
        self.subcategory_embedding = PadEmbedding(
            c.subcategory_nums, c.cate_embed_size, c.compute_dtype)
        self.title_encoder = CNNTitleEncoder(
            n_words=c.n_words, word_embed_size=c.word_embed_size,
            num_filters=c.num_filters, kernel_size=c.kernel_size,
            query_dim=c.query_vector_dim, dropout=c.dropout,
            compute_dtype=c.compute_dtype,
            freeze_embeddings=c.freeze_word_embeddings)
        self.news_dim = c.num_filters + 2 * c.cate_embed_size
        if c.long_short_term_method == "ini":
            self.gru_dim = self.news_dim
            self.user_embed_dim = self.news_dim
        else:  # 'con'
            self.gru_dim = self.news_dim // 2
            self.user_embed_dim = self.news_dim - self.gru_dim
        n_users = max(c.n_users, 1)
        self.user_embedding = PadEmbedding(
            n_users, self.user_embed_dim, c.compute_dtype)
        self.gru = MaskedGRU(self.gru_dim, c.compute_dtype)

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        title_vec = self.title_encoder(feats["title"], deterministic)
        categ_vec = self.category_embedding(feats["categ"])
        subcateg_vec = self.subcategory_embedding(feats["subcateg"])
        return jnp.concatenate([categ_vec, subcateg_vec, title_vec], axis=-1)

    def _user_vector(self, batch, browsed_ids, browsed_vecs) -> jax.Array:
        c = self.cfg
        B = browsed_vecs.shape[0]
        cd = jnp.dtype(c.compute_dtype)
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        if "user_ids" in batch:
            long_term = self.user_embedding(batch["user_ids"])   # [B, U]
        else:
            long_term = jnp.zeros((B, self.user_embed_dim), cd)
        if c.long_short_term_method == "ini":
            init = long_term.astype(cd)
            return self.gru(browsed_vecs.astype(cd), hist_mask, init)
        init = jnp.zeros((B, self.gru_dim), cd)
        short_term = self.gru(browsed_vecs.astype(cd), hist_mask, init)
        return jnp.concatenate([short_term, long_term.astype(cd)], axis=-1)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        user_vec = self._user_vector(batch, browsed_ids, browsed_vecs)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
