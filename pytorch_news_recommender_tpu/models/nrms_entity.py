"""NRMS + knowledge-entity view: title attention tower fused with a pooled
WikiData-entity embedding view.

The reference PREPARES this path but never wires it: the entity matrix
builder exists (``tools.py:30-48``), per-news entity ids flow through
preprocessing commented out (``data_handler.py:171-172``), and both
``nrms.py:124-126`` and ``nrms_naml.py:117-126`` carry commented-out entity
encoders. This family completes it (BASELINE.json config 3: "NRMS + entity
embeddings on MIND-large (sharded embedding tables)"):

* entity tower: ``entity [.., E]`` ids -> trainable ``entity_embedding``
  table (initialized from the TransE vectors via the Trainer's pretrained
  surgery; row-shardable over the ``model`` mesh axis by the
  ``entity_embedding/embedding`` partition rule) -> additive-attention pool
  over the E entities (pad id 0 masked);
* news vector = Dense(D) over concat[title_vec | entity_vec] — keeps the
  user tower at the word dim so the NRMS user encoder is reused unchanged;
* scoring: masked dot product.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import (
    AdditiveAttention,
    NewsEncoder,
    PadEmbedding,
    UserEncoder,
)
from pytorch_news_recommender_tpu.ops.attention import dot_product_scores


class NRMSEntity(RecModel):
    """Title + entity two-view news encoder with NRMS user tower."""

    cfg: ModelConfig

    FEAT_KEYS = ("title", "entity")

    def setup(self):
        c = self.cfg
        assert c.entity_nums > 0, "dataset has no entity features"
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
        self.entity_embedding = PadEmbedding(
            c.entity_nums, c.entity_embed_size, c.compute_dtype)
        self.entity_attention = AdditiveAttention(
            c.query_vector_dim, c.compute_dtype)
        self.fuse = nn.Dense(c.word_embed_size,
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
        title_vec = self.news_encoder(feats["title"], deterministic)
        ent_ids = feats["entity"]                        # [.., E]
        ent = self.entity_embedding(ent_ids)             # [.., E, De]
        ent_mask = (ent_ids != 0).astype(jnp.float32)
        lead = ent.shape[:-2]
        ent_vec = self.entity_attention(
            ent.reshape(-1, *ent.shape[-2:]),
            ent_mask.reshape(-1, ent_mask.shape[-1]),
        ).reshape(*lead, ent.shape[-1])
        # news with zero entities contribute a zero entity view
        any_ent = (ent_mask.sum(-1) > 0).astype(ent_vec.dtype)[..., None]
        return self.fuse(jnp.concatenate(
            [title_vec, ent_vec * any_ent], axis=-1))

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
