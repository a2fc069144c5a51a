"""DiSAN: directional multi-dimensional self-attention news tower.

The reference ships DiSAN as an UNWIRED building block
(``MIND_2020/model/disan.py`` — no Model imports it; SURVEY.md §2.1). Here it
is both a reusable layer and a registered model family (``disan``) wired the
way the reference's NRMS variants are: DiSAN sentence encoder as the news
tower + attention user tower + dot-product scoring.

Layer semantics mirror ``disan.py:70-185``:

* token-pair logits ``c * tanh((W1 h_j + W2 h_i + b) / c)`` with c=5.0,
  per-DIMENSION (multi-dim attention: softmax over the token axis for every
  hidden dim separately, ``disan.py:128-140``);
* forward/backward directional masks (strict upper/lower triangles,
  ``disan.py:18-28``) intersected with the validity mask;
* fusion gate ``sigmoid(Wf1 h + Wf2 attn + bf)`` blending attention output
  with the input map (``disan.py:146-149``);
* fw and bw passes concatenated then Source2Token pooling (ELU MLP +
  per-dimension masked softmax over tokens, ``disan.py:38-67``) ->
  ``[2 * d_h]`` sentence vector.

The masked softmax uses ``-1e9`` logit fill (restricted-support softmax) —
numerically equivalent to the reference's multiply-then-renormalize
(``disan.py:7-15``) on the valid support.

TPU note: the ``[B, L, L, Dh]`` multi-dim logit tensor is the cost center
(L=20 title words). It lowers to pure VPU elementwise + reductions; keep
``d_h`` modest (``disan_hidden``) — the tensor is B*400*d_h elements.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import UserEncoder, WordEmbedding
from pytorch_news_recommender_tpu.ops.attention import NEG_INF, dot_product_scores


class DiSA(nn.Module):
    """One directional self-attention pass (``disan.py:70-156``)."""

    d_h: int
    direction: str              # 'fw' | 'bw'
    dropout: float
    compute_dtype: str

    @nn.compact
    def __call__(self, x: jax.Array, rep_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cd = jnp.dtype(self.compute_dtype)
        L = x.shape[-2]
        drop = lambda t: nn.Dropout(self.dropout,
                                    deterministic=deterministic)(t)

        rep = nn.elu(nn.Dense(self.d_h, dtype=cd, name="fc")(drop(x)))
        rep_dp = drop(rep)
        dep = nn.Dense(self.d_h, use_bias=False, dtype=cd, name="w1")(rep_dp)
        head = nn.Dense(self.d_h, use_bias=False, dtype=cd, name="w2")(rep_dp)
        b1 = self.param("b1", nn.initializers.zeros, (self.d_h,))

        c = 5.0  # non-trainable scale (disan.py:100)
        logits = c * jnp.tanh(
            (dep[..., None, :, :] + head[..., :, None, :] + b1) / c
        ).astype(jnp.float32)                                # [B, i, j, Dh]

        ar = jnp.arange(L)
        if self.direction == "fw":
            direct = ar[None, :] > ar[:, None]               # j > i
        else:
            direct = ar[None, :] < ar[:, None]               # j < i
        pair = direct[None, :, :] & (rep_mask[..., None, :] > 0)  # [B, i, j]

        logits = jnp.where(pair[..., None], logits, NEG_INF)
        att = jax.nn.softmax(logits, axis=-2)                # softmax over j
        att = att * pair[..., None]
        res = jnp.einsum("bijd,bjd->bid", att.astype(cd), rep,
                         preferred_element_type=jnp.float32).astype(cd)

        bf = self.param("bf", nn.initializers.zeros, (self.d_h,))
        gate = nn.sigmoid(
            nn.Dense(self.d_h, use_bias=False, dtype=cd, name="wf1")(drop(rep))
            + nn.Dense(self.d_h, use_bias=False, dtype=cd, name="wf2")(drop(res))
            + bf)
        out = gate * rep + (1 - gate) * res
        return out * rep_mask[..., None].astype(cd)


class Source2Token(nn.Module):
    """Per-dimension masked-softmax pooling (``disan.py:38-67``)."""

    dropout: float
    compute_dtype: str

    @nn.compact
    def __call__(self, x: jax.Array, rep_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        cd = jnp.dtype(self.compute_dtype)
        D = x.shape[-1]
        drop = lambda t: nn.Dropout(self.dropout,
                                    deterministic=deterministic)(t)
        h = nn.elu(nn.Dense(D, dtype=cd, name="fc1")(drop(x)))
        logits = nn.Dense(D, dtype=cd, name="fc2")(drop(h)).astype(jnp.float32)
        logits = jnp.where(rep_mask[..., None] > 0, logits, NEG_INF)
        soft = jax.nn.softmax(logits, axis=-2)               # over tokens
        soft = soft * (rep_mask[..., None] > 0)
        return jnp.sum(x * soft.astype(cd), axis=-2)


class DiSANEncoder(nn.Module):
    """fw + bw DiSA, concat, Source2Token -> ``[..., 2*d_h]``."""

    d_h: int
    dropout: float
    compute_dtype: str

    @nn.compact
    def __call__(self, x: jax.Array, rep_mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        fw = DiSA(self.d_h, "fw", self.dropout, self.compute_dtype,
                  name="fw")(x, rep_mask, deterministic)
        bw = DiSA(self.d_h, "bw", self.dropout, self.compute_dtype,
                  name="bw")(x, rep_mask, deterministic)
        u = jnp.concatenate([fw, bw], axis=-1)
        return Source2Token(self.dropout, self.compute_dtype,
                            name="source2token")(u, rep_mask, deterministic)


class DiSANRec(RecModel):
    """DiSAN news tower + attention user tower + dot-product scoring."""

    cfg: ModelConfig

    FEAT_KEYS = ("title",)

    def setup(self):
        c = self.cfg
        self.d_h = c.disan_hidden or c.word_embed_size
        self.word_embedding = WordEmbedding(
            c.n_words, c.word_embed_size, c.compute_dtype,
            trainable=not c.freeze_word_embeddings,
            embedding_lookup=c.embedding_lookup,
            a2a_capacity_factor=c.a2a_capacity_factor)
        self.disan = DiSANEncoder(self.d_h, c.dropout, c.compute_dtype)
        self.user_encoder = UserEncoder(
            model_dim=2 * self.d_h,
            num_heads=c.user_heads_num,
            query_dim=c.query_vector_dim,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
        )

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        ids = feats["title"]
        mask = (ids != 0).astype(jnp.float32)
        x = self.word_embedding(ids, mask)
        lead = x.shape[:-2]
        x2 = x.reshape(-1, *x.shape[-2:])
        m2 = mask.reshape(-1, mask.shape[-1])
        out = self.disan(x2, m2, deterministic)
        return out.reshape(*lead, 2 * self.d_h)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
