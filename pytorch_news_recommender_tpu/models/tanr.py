"""TANR: topic-aware news recommendation (auxiliary topic-prediction task).

The reference committed only an EMPTY placeholder for this family
(``MIND_2020/model/tanr.py`` — 0 bytes; SURVEY.md §2.1). Implemented here per
the TANR recipe (Wu et al., ACL 2019), on our attention towers:

* news tower = NRMS title tower (shared ``layers.NewsEncoder``);
* auxiliary task: a linear topic classifier on each news vector predicts the
  news CATEGORY; its cross-entropy (pad news masked) is sown into the
  ``losses`` collection, which the trainer adds to the click loss — weight
  ``topic_loss_weight`` (paper's lambda, default 0.2) applied at sow site;
* user tower + masked dot-product scoring as in NRMS.

The aux head regularizes news vectors toward topical separability; at eval /
serving the head is unused (``deterministic=True`` skips the sow), so the
two-tower cached path is identical to NRMS's.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import NewsEncoder, UserEncoder
from pytorch_news_recommender_tpu.ops.attention import dot_product_scores


class TANR(RecModel):
    """NRMS towers + topic-prediction auxiliary loss."""

    cfg: ModelConfig

    FEAT_KEYS = ("title", "categ")
    HAS_AUX_LOSS = True

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
        self.topic_head = nn.Dense(c.category_nums,
                                   dtype=jnp.dtype(c.compute_dtype))
        self.user_encoder = UserEncoder(
            model_dim=c.word_embed_size,
            num_heads=c.user_heads_num,
            query_dim=c.query_vector_dim,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
        )

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        vec = self.news_encoder(feats["title"], deterministic)
        # head applied unconditionally so init materializes its params;
        # unused at eval -> XLA dead-code-eliminates it
        logits = self.topic_head(vec).astype(jnp.float32)
        if not deterministic:
            # auxiliary topic CE over the real (non-pad) news in this batch
            categ = feats["categ"]
            logp = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(logp, categ[..., None], axis=-1)[..., 0]
            maskf = (categ != 0).astype(jnp.float32)
            ce = jnp.sum(ce * maskf) / jnp.maximum(jnp.sum(maskf), 1.0)
            self.sow("losses", "topic_ce",
                     self.cfg.topic_loss_weight * ce,
                     reduce_fn=lambda a, b: b)
        return vec

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
