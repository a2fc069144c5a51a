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

from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.layers import NewsEncoder, UserEncoder
from pytorch_news_recommender_tpu.ops.attention import dot_product_scores


class NRMS(nn.Module):
    """Title-only batched NRMS."""

    cfg: ModelConfig

    def setup(self):
        c = self.cfg
        self.news_encoder = NewsEncoder(
            n_words=c.n_words,
            word_embed_size=c.word_embed_size,
            num_heads=c.num_attention_heads,
            query_dim=c.query_vector_dim,
            dropout=c.dropout,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
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

    def score_from_vecs(
        self,
        batch: Dict[str, jax.Array],
        news_vecs: jax.Array,  # [N, D] precomputed via encode_news
    ) -> jax.Array:
        """Two-tower scoring from a cached news-vector table — the serving /
        fast-eval path (reference ``nrms_v0.py:278-312`` semantics, but with
        the whole corpus encoded once instead of re-encoding 300 candidates
        per impression)."""
        browsed_ids = batch["browsed_ids"]
        cand_ids = batch["candidate_ids"]
        browsed_vecs = jnp.take(news_vecs, browsed_ids, axis=0)
        cand_vecs = jnp.take(news_vecs, cand_ids, axis=0)
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))

    def __call__(
        self,
        batch: Dict[str, jax.Array],
        news_feats: Dict[str, jax.Array],
        deterministic: bool = True,
    ) -> jax.Array:
        """Score candidates for each impression.

        Args:
          batch: either direct form — ``browsed_ids [B, H]``,
            ``candidate_ids [B, S]`` int32 news indices (0 = pad; real news
            start at 1 as in the reference's ``+1`` index mapping,
            ``data_handler.py:60-66``) — or deduplicated form from
            ``loader.dedup_batch``: ``unique_ids [U]`` plus ``browsed_idx`` /
            ``candidate_idx`` inverse indices, in which case each distinct
            news in the batch is encoded exactly once.
          news_feats: device-resident feature tables; uses ``title [N, L]``.
        Returns:
          ``[B, S]`` float32 scores, padded candidates at ``-1e9``.
        """
        if "unique_ids" in batch:
            unique_ids = batch["unique_ids"]                        # [U]
            titles = jnp.take(news_feats["title"], unique_ids, axis=0)
            uvecs = self.news_encoder(titles, deterministic)        # [U, D]
            browsed_ids = jnp.take(unique_ids, batch["browsed_idx"], axis=0)
            cand_ids = jnp.take(unique_ids, batch["candidate_idx"], axis=0)
            browsed_vecs = jnp.take(uvecs, batch["browsed_idx"], axis=0)
            cand_vecs = jnp.take(uvecs, batch["candidate_idx"], axis=0)
        else:
            browsed_ids = batch["browsed_ids"]
            cand_ids = batch["candidate_ids"]
            H = browsed_ids.shape[1]
            all_ids = jnp.concatenate([browsed_ids, cand_ids], axis=1)
            titles = jnp.take(news_feats["title"], all_ids, axis=0)
            vecs = self.news_encoder(titles, deterministic)         # [B, H+S, D]
            browsed_vecs, cand_vecs = vecs[:, :H], vecs[:, H:]

        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return self.score(user_vec, cand_vecs, (cand_ids != 0))
