"""NRMS: word-level multi-head self-attention news encoder + attention user
encoder + dot-product scoring.

Semantics of the reference's batched variant ``MIND_2020/model/nrms_v1.py``
(the strongest published model, dev AUC 0.675 — ``res_logs.md:6``), but
TPU-first:

* ONE news-encoder call covers history AND candidates for the whole batch —
  the reference launches a Python loop with one kernel per news slot
  (``nrms_v1.py:263-268``).
* Batches carry only ``[B, H]``/``[B, S]`` int32 news indices; title word-ids
  are gathered on device from a resident feature table, so the host ships a
  few KB per step instead of re-assembling ``[B, 50, 20]`` word tensors
  (cf. reference ``data_handler.py:185-250``).
* Exposes the two-tower serving API (``encode_news`` / ``encode_user`` /
  ``score``) like the reference's ``nrms_v0.py:278-312``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import NewsEncoder, UserEncoder
from pytorch_news_recommender_tpu.ops.attention import dot_product_scores


class NRMS(RecModel):
    """Title-only batched NRMS."""

    cfg: ModelConfig

    FEAT_KEYS = ("title",)

    def setup(self):
        c = self.cfg
        self.news_encoder = NewsEncoder(
            embedding_lookup=c.embedding_lookup,
            a2a_capacity_factor=c.a2a_capacity_factor,
            n_words=c.n_words,
            word_embed_size=c.word_embed_size,
            num_heads=c.num_attention_heads,
            query_dim=c.query_vector_dim,
            dropout=c.dropout,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
            freeze_embeddings=c.freeze_word_embeddings,
        )
        self.user_encoder = UserEncoder(
            model_dim=c.word_embed_size,
            num_heads=c.user_heads_num,
            query_dim=c.query_vector_dim,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
        )

    # ---- two-tower serving API ----
    def encode_news(self, title_ids: jax.Array, deterministic: bool = True) -> jax.Array:
        """``[..., L]`` word ids -> ``[..., D]`` news vectors."""
        return self.news_encoder(title_ids, deterministic)

    def encode_user(self, browsed_vecs: jax.Array, mask: jax.Array) -> jax.Array:
        """``[B, H, D]`` clicked-news vectors -> ``[B, D]`` user vector."""
        return self.user_encoder(browsed_vecs, mask)

    def score(self, user_vec: jax.Array, cand_vecs: jax.Array,
              cand_mask: jax.Array | None = None) -> jax.Array:
        return dot_product_scores(user_vec, cand_vecs, cand_mask)

    # ---- RecModel contract ----
    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        return self.news_encoder(feats["title"], deterministic)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
