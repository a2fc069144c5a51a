"""NPA: Neural News Recommendation with Personalized Attention (Wu et al.,
KDD 2019 — see PAPERS.md). An extension family: the reference repo never
implemented it, but it completes the classic quartet next to NRMS
(`nrms.py`), NAML (`naml.py`) and LSTUR (`lstur.py`).

Architecture: a user-id embedding generates two personalized query vectors
(one per dense+ReLU head); the news tower is word embed -> CNN -> attention
pooled by the *word* query, and the user tower pools clicked-news vectors by
the *news* query. Dot-product scoring.

TPU notes. Because the news pooling is user-conditioned, news vectors are
NOT user-independent — so this family opts out of the two-tower cached eval
(``TWO_TOWER = False``; the evaluator falls back to full scoring) and the
batch-dedup path only deduplicates the expensive user-independent prefix
(word embed + CNN over each distinct news), gathering the ``[.., L, F]``
token maps back per slot for the cheap personalized pooling. Unknown users
(id 0, and datasets without user ids) get the zero embedding row, like
LSTUR's cold-start behavior.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import (
    PadEmbedding,
    WordEmbedding,
    _dtype,
)
from pytorch_news_recommender_tpu.ops.attention import NEG_INF, dot_product_scores


class PersonalizedAttention(nn.Module):
    """Additive attention whose query is a per-sample vector (not a learned
    global parameter like ``AdditiveAttention``)."""

    query_dim: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, query: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
        """``x [..., L, D]``, ``query [..., Q]`` (leading dims broadcastable
        against x's), ``mask [..., L]`` -> ``[..., D]``."""
        D = x.shape[-1]
        cd = _dtype(self.compute_dtype)
        w = self.param("w", nn.initializers.xavier_uniform(),
                       (D, self.query_dim))
        b = self.param("b", nn.initializers.zeros, (self.query_dim,))
        proj = jnp.tanh(
            jnp.einsum("...ld,dq->...lq", x.astype(cd), w.astype(cd),
                       preferred_element_type=jnp.float32) + b)
        scores = jnp.einsum("...lq,...q->...l", proj,
                            query.astype(proj.dtype),
                            preferred_element_type=jnp.float32)
        if mask is not None:
            scores = jnp.where(mask > 0, scores, NEG_INF)
        wts = jax.nn.softmax(scores, axis=-1)
        return jnp.einsum("...l,...ld->...d", wts.astype(x.dtype), x,
                          preferred_element_type=jnp.float32).astype(x.dtype)


class NPA(RecModel):
    cfg: ModelConfig

    FEAT_KEYS = ("title",)
    TWO_TOWER = False  # news vectors are user-conditioned
    LENGTH_SPLIT_OK = False  # custom dedup path keeps full token maps

    def setup(self):
        c = self.cfg
        # 50-d user embedding per the NPA paper (§3.1); id 0 = unknown user
        self.user_embedding = PadEmbedding(
            max(c.n_users, 1), 50, c.compute_dtype)
        # Personalized queries are deliberately narrower than the shared
        # additive-attention dim: the benchmarks/npa_sweep.py grid shows
        # the half-width query learns much faster at equal quality ceiling
        # (battery 0.835 -> 0.898 AUC @ 3 epochs at the swept-best lr).
        q = c.npa_query_dim or max(c.query_vector_dim // 2, 1)
        self.word_query = nn.Dense(q, name="word_query")
        self.news_query = nn.Dense(q, name="news_query")
        self.word_embedding = WordEmbedding(
            c.n_words, c.word_embed_size, c.compute_dtype,
            trainable=not c.freeze_word_embeddings,
            embedding_lookup=c.embedding_lookup,
            a2a_capacity_factor=c.a2a_capacity_factor)
        self.title_cnn = nn.Conv(
            c.num_filters, kernel_size=(c.kernel_size,), padding="SAME",
            dtype=jnp.dtype(c.compute_dtype), name="title_cnn")
        self.word_pa = PersonalizedAttention(q, c.compute_dtype)
        self.news_pa = PersonalizedAttention(q, c.compute_dtype)
        self.embed_dropout = nn.Dropout(c.dropout)
        self.cnn_dropout = nn.Dropout(c.dropout)

    # user-independent prefix: word embed -> dropout -> CNN -> ReLU
    def _token_maps(self, title_ids: jax.Array,
                    deterministic: bool) -> jax.Array:
        mask = (title_ids != 0).astype(jnp.float32)
        x = self.word_embedding(title_ids, mask)
        x = self.embed_dropout(x, deterministic=deterministic)
        h = nn.relu(self.title_cnn(x))
        return self.cnn_dropout(h, deterministic=deterministic)

    def _queries(self, batch: Batch, B: int):
        uid = batch.get("user_ids")
        if uid is None:
            uid = jnp.zeros((B,), jnp.int32)
        u = self.user_embedding(uid)                        # [B, U]
        qw = nn.relu(self.word_query(u))                    # [B, Q]
        qd = nn.relu(self.news_query(u))
        return qw, qd

    def __call__(self, batch: Batch, news_feats: Batch,
                 deterministic: bool = True) -> jax.Array:
        if "unique_ids" in batch:
            unique_ids = batch["unique_ids"]
            titles = jnp.take(news_feats["title"], unique_ids, axis=0)
            h_u = self._token_maps(titles, deterministic)   # [U, L, F]
            browsed_ids = jnp.take(unique_ids, batch["browsed_idx"], axis=0)
            cand_ids = jnp.take(unique_ids, batch["candidate_idx"], axis=0)
            browsed_h = jnp.take(h_u, batch["browsed_idx"], axis=0)
            cand_h = jnp.take(h_u, batch["candidate_idx"], axis=0)
        else:
            browsed_ids = batch["browsed_ids"]
            cand_ids = batch["candidate_ids"]
            Hn = browsed_ids.shape[1]
            all_ids = jnp.concatenate([browsed_ids, cand_ids], axis=1)
            titles = jnp.take(news_feats["title"], all_ids, axis=0)
            h = self._token_maps(titles, deterministic)     # [B, H+S, L, F]
            browsed_h, cand_h = h[:, :Hn], h[:, Hn:]

        B = browsed_ids.shape[0]
        qw, qd = self._queries(batch, B)

        # word masks per slot (gathered from the title table)
        b_titles = jnp.take(news_feats["title"], browsed_ids, axis=0)
        c_titles = jnp.take(news_feats["title"], cand_ids, axis=0)
        b_wmask = (b_titles != 0).astype(jnp.float32)       # [B, H, L]
        c_wmask = (c_titles != 0).astype(jnp.float32)

        browsed_vecs = self.word_pa(browsed_h, qw[:, None, :], b_wmask)
        cand_vecs = self.word_pa(cand_h, qw[:, None, :], c_wmask)

        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.news_pa(browsed_vecs, qd, hist_mask)  # [B, F]
        cand_mask = (cand_ids != 0).astype(jnp.float32)
        return dot_product_scores(user_vec, cand_vecs, cand_mask)
