"""HieRec-style hierarchical user-interest model.

One of the two north-star extensions named by BASELINE.json (configs 4-5) —
there is no reference implementation to mirror (the closest artifact is the
empty ``MIND_2020/model/tanr.py`` topic-model placeholder), so this follows
the HieRec recipe (Qi et al., ACL 2021) re-designed for static-shape TPU
execution:

* news tower = NRMS title tower (shared building blocks, ``layers.py``);
* user interests at THREE granularities:
  - **subcategory-level**: for each candidate, attention over exactly the
    clicked news sharing the candidate's subcategory;
  - **category-level**: same, at category granularity;
  - **global**: additive-attention pooling over the whole history (the NRMS
    user tower).
* score = softmax-gated sum of the three dot products; candidates whose
  (sub)category never appears in the history contribute 0 at that level
  (their gate mass folds into the coarser levels).

TPU-first design note: instead of materializing per-(sub)category interest
tables (``[B, n_subcategories, D]`` — 294-wide scatter per user), the
matched-interest vectors are computed PER CANDIDATE with an
``[B, S, H]`` equality-masked attention — three small einsums, no scatters,
fully static shapes. Needs ``news_feats`` at scoring time (``categ`` /
``subcateg`` gathers by id), which the RecModel contract provides.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import NewsEncoder, UserEncoder
from pytorch_news_recommender_tpu.ops.attention import NEG_INF


def _matched_interest_scores(
    cand_vecs: jax.Array,      # [B, S, D]
    hist_vecs: jax.Array,      # [B, H, D]
    cand_tags: jax.Array,      # [B, S] int (category of each candidate)
    hist_tags: jax.Array,      # [B, H] int
    hist_valid: jax.Array,     # [B, H] bool
) -> jax.Array:
    """Per-candidate interest score at one granularity.

    For candidate ``s``, attend over the clicked news whose tag equals the
    candidate's tag; the interest vector is the attention-weighted sum, and
    the returned score is its dot product with the candidate (0 when the user
    has no clicks with that tag)."""
    D = cand_vecs.shape[-1]
    match = (hist_tags[:, None, :] == cand_tags[:, :, None])      # [B, S, H]
    match = match & hist_valid[:, None, :] & (cand_tags != 0)[:, :, None]
    logits = jnp.einsum("bsd,bhd->bsh", cand_vecs, hist_vecs,
                        preferred_element_type=jnp.float32)
    logits = logits / jnp.sqrt(jnp.float32(D))
    logits = jnp.where(match, logits, NEG_INF)
    att = jax.nn.softmax(logits, axis=-1)
    has_match = jnp.any(match, axis=-1)                           # [B, S]
    att = att * has_match[..., None]          # kill all-masked softmax rows
    interest = jnp.einsum("bsh,bhd->bsd", att.astype(cand_vecs.dtype),
                          hist_vecs, preferred_element_type=jnp.float32)
    return jnp.einsum("bsd,bsd->bs", interest.astype(jnp.float32),
                      cand_vecs.astype(jnp.float32))


class HieRec(RecModel):
    """Hierarchical (subcategory / category / global) interest matching."""

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
        # softmax gate over (subcategory, category, global) levels
        self.level_logits = self.param(
            "level_logits", nn.initializers.zeros, (3,))

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        return self.news_encoder(feats["title"], deterministic)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        assert news_feats is not None, "HieRec needs news_feats at score time"
        hist_valid = browsed_ids != 0
        hist_mask = hist_valid.astype(jnp.float32)
        cand_mask = cand_ids != 0

        cat = news_feats["categ"]
        sub = news_feats["subcateg"]
        s_sub = _matched_interest_scores(
            cand_vecs, browsed_vecs,
            jnp.take(sub, cand_ids, axis=0), jnp.take(sub, browsed_ids, axis=0),
            hist_valid)
        s_cat = _matched_interest_scores(
            cand_vecs, browsed_vecs,
            jnp.take(cat, cand_ids, axis=0), jnp.take(cat, browsed_ids, axis=0),
            hist_valid)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        s_glob = jnp.einsum("bd,bsd->bs", user_vec.astype(jnp.float32),
                            cand_vecs.astype(jnp.float32))

        w = jax.nn.softmax(self.level_logits.astype(jnp.float32))
        scores = w[0] * s_sub + w[1] * s_cat + w[2] * s_glob
        return jnp.where(cand_mask, scores, NEG_INF)
