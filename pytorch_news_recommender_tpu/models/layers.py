"""Flax modules for the NRMS-family towers.

Thin parameter-holding wrappers over the pure ops in ``ops/attention.py`` (and
the fused Pallas path in ``ops/pallas`` when enabled). Semantics mirror the
reference building blocks:

* ``MultiHeadSelfAttention`` — reference ``MIND_2020/model/nrms_v1.py:41-80``
  (Xavier-uniform init, output projection, per-head 1/sqrt(d_k) scaling).
* ``AdditiveAttention``      — reference ``nrms_v1.py:83-105``
  (learned query ~ U(-0.1, 0.1)).
* ``NewsEncoder``            — reference ``nrms_v1.py:109-197``:
  word-embedding lookup -> dropout -> MHSA -> dropout -> additive pooling,
  but fully batched over an arbitrary leading news axis (the reference loops
  in Python over history/candidates, ``nrms_v1.py:263-268``).
* ``UserEncoder``            — reference ``nrms_v1.py:200-211`` /
  ``nrms.py:258-272`` (mask-aware): MHSA over clicked-news vectors +
  additive pooling.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.ops import attention as A


def _dtype(name: str):
    return jnp.dtype(name)


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _masked_lookup(table, ids, maskf, cd):
    """``take(table, ids).astype(cd) * mask`` with a traffic-lean backward.

    Autodiff of the plain expression materializes TWO full-size f32 copies
    of the ``[M*L, D]`` token cotangent (the convert of the astype VJP and
    the mask multiply) before XLA's scatter pipeline even starts — ~600 MB
    of HBM traffic per step at bench dimensions. The custom backward keeps
    the chain in the compute dtype and hands ``(g * mask).astype(f32)``
    straight to the scatter-add, where XLA fuses the elementwise producers
    into the update gather.
    """
    out = jnp.take(table, ids, axis=0).astype(cd)
    return out * maskf[..., None].astype(cd)


def _masked_lookup_fwd(table, ids, maskf, cd):
    return _masked_lookup(table, ids, maskf, cd), (table.shape, ids, maskf)


def _masked_lookup_bwd(cd, res, g):
    shape, ids, maskf = res
    upd = g * maskf[..., None].astype(g.dtype)        # compute dtype
    flat = upd.reshape(-1, shape[1])
    dtable = jnp.zeros(shape, jnp.float32).at[ids.reshape(-1)].add(
        flat.astype(jnp.float32))                     # convert fuses in
    return dtable, None, None


_masked_lookup.defvjp(_masked_lookup_fwd, _masked_lookup_bwd)


def _scheduled_lookup(table, ids, maskf, cd, schedule: str,
                      capacity_factor: float):
    """Route an embedding lookup through a hand-scheduled sharded path.

    ``schedule`` is ``ModelConfig.embedding_lookup``; with "auto", no
    registered mesh, or a 1-wide model axis this falls back to the plain
    (custom-VJP) lookup. "psum" and "a2a" produce values identical to the
    auto path (``tests/test_sharding.py``); a2a bucket overflow NaN-poisons
    the output so it is never silent. A vocab not divisible by the model
    axis is padded in-trace (one table copy — keep vocabularies divisible
    in production)."""
    from pytorch_news_recommender_tpu.parallel.sharded_embedding import (
        active_mesh,
        sharded_embedding_lookup,
        sharded_embedding_lookup_a2a,
    )
    mesh = active_mesh()
    if (schedule == "auto" or mesh is None
            or mesh.shape.get("model", 1) <= 1):
        if maskf is not None:
            return _masked_lookup(table, ids, maskf, cd)
        return jnp.take(table, ids, axis=0).astype(cd)
    n_model = mesh.shape["model"]
    pad = (-table.shape[0]) % n_model
    if pad:
        table = jnp.pad(table, ((0, pad), (0, 0)))
    if schedule == "psum":
        out = sharded_embedding_lookup(table, ids, mesh)
    elif schedule == "a2a":
        # masked lookups zero pad-id rows anyway, so id-0 slots skip the
        # exchange entirely (they would otherwise all route to owner shard 0
        # — a dedup unique buffer is zero-padded to its bucket width)
        out, dropped = sharded_embedding_lookup_a2a(
            table, ids, mesh, capacity_factor=capacity_factor,
            skip_id=0 if maskf is not None else None)
        # never-silent overflow: poison the batch instead of returning
        # zero rows as if they were real embeddings
        out = out + jnp.where(dropped == 0, 0.0, jnp.nan).astype(out.dtype)
    else:
        raise ValueError(
            f"embedding_lookup must be auto|psum|a2a, got {schedule!r}")
    out = out.astype(cd)
    if maskf is not None:
        out = out * maskf[..., None].astype(cd)
    return out


class MultiHeadSelfAttention(nn.Module):
    """Self-attention with fused QKV projection and output projection."""

    num_heads: int
    model_dim: int
    compute_dtype: str = "float32"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        D = self.model_dim
        assert D % self.num_heads == 0, (D, self.num_heads)
        wqkv = self.param("wqkv", nn.initializers.xavier_uniform(), (D, 3 * D))
        bqkv = self.param("bqkv", nn.initializers.zeros, (3 * D,))
        wo = self.param("wo", nn.initializers.xavier_uniform(), (D, D))
        bo = self.param("bo", nn.initializers.zeros, (D,))
        cd = _dtype(self.compute_dtype)
        out = A.multi_head_self_attention(
            x.astype(cd), wqkv.astype(cd), bqkv.astype(cd),
            wo.astype(cd), bo.astype(cd), self.num_heads, mask,
        )
        return out


class AdditiveAttention(nn.Module):
    """``softmax(tanh(xW + b) @ q)``-weighted pooling over the sequence axis."""

    query_dim: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        D = x.shape[-1]
        w = self.param("w", nn.initializers.xavier_uniform(), (D, self.query_dim))
        b = self.param("b", nn.initializers.zeros, (self.query_dim,))
        query = self.param(
            "query", nn.initializers.uniform(scale=0.2), (self.query_dim,)
        )
        # uniform(scale) is U(0, scale); shift to U(-0.1, 0.1) like the
        # reference's .uniform_(-0.1, 0.1) (nrms_v1.py:89).
        cd = _dtype(self.compute_dtype)
        pooled, wts = A.additive_attention_with_weights(
            x.astype(cd), w.astype(cd), b.astype(cd),
            (query - 0.1).astype(cd), mask,
        )
        # No-op (and DCE'd) unless applied with mutable=["intermediates"] —
        # see utils/inspect.py (the working version of the reference's
        # commented-out attention-weight TensorBoard hook, nrms_v0.py:94-122).
        self.sow("intermediates", "attn_weights", wts)
        return pooled


class WordEmbedding(nn.Module):
    """Trainable word-embedding table, row 0 = padding.

    Initialized from a pretrained matrix (GloVe) when provided via
    ``pretrained``; otherwise ~N(0, 1) with a zero pad row, matching the
    reference artifact layout (``data_processor.py:67-97``). Pad positions are
    zeroed via the mask product instead of torch's ``padding_idx`` machinery.
    """

    n_words: int
    embed_size: int
    compute_dtype: str = "float32"
    trainable: bool = True  # reference Embedding.from_pretrained(freeze=...)
                            # (nrms.py:121-123, nrms.py:222-224)
    # hand-scheduled sharded lookup: "auto" | "psum" | "a2a"
    # (ModelConfig.embedding_lookup; see layers._scheduled_lookup)
    embedding_lookup: str = "auto"
    a2a_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, ids: jax.Array, mask: Optional[jax.Array] = None) -> jax.Array:
        def init(key, shape, dtype=jnp.float32):
            emb = jax.random.normal(key, shape, dtype)
            return emb.at[0].set(0.0)

        table = self.param("embedding", init, (self.n_words, self.embed_size))
        if not self.trainable:
            table = jax.lax.stop_gradient(table)
        cd = _dtype(self.compute_dtype)
        maskf = mask.astype(jnp.float32) if mask is not None else None
        return _scheduled_lookup(table, ids, maskf, cd,
                                 self.embedding_lookup,
                                 self.a2a_capacity_factor)


class PadEmbedding(nn.Module):
    """Embedding table with row 0 pinned to zero at lookup time — the
    functional equivalent of torch's ``padding_idx=0`` (zero pad row AND zero
    gradient for it; here pad contributions are masked out, so row 0's
    gradient is identically zero). Used for category / subcategory / entity
    tables (reference ``nrms_naml.py:104-105``)."""

    num: int
    dim: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num, self.dim))
        return _masked_lookup(table, ids, (ids != 0).astype(jnp.float32),
                              _dtype(self.compute_dtype))


def _uniform_pm(scale: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class AttentionPoolTower(nn.Module):
    """MHSA + additive-attention pooling over ``[..., L, D]`` with a shared
    parameter set, runnable through either the jnp ops or the fused Pallas
    kernel (``ops/pallas/fused_encoder.py``) — the kernel consumes the exact
    same parameters, so the paths are interchangeable at checkpoint level.

    This is the shared core of both the news tower (L = title words) and the
    user tower (L = history length); reference ``nrms_v1.py:109-211``.
    """

    model_dim: int
    num_heads: int
    query_dim: int
    dropout: float = 0.0          # post-MHSA dropout (nrms_v1.py:161)
    compute_dtype: str = "float32"
    use_pallas: bool = False
    pallas_interpret: bool = False  # testing hook: interpret-mode kernel

    @nn.compact
    def __call__(self, x: jax.Array, mask: jax.Array,
                 deterministic: bool = True) -> jax.Array:
        D = self.model_dim
        wqkv = self.param("wqkv", nn.initializers.xavier_uniform(), (D, 3 * D))
        bqkv = self.param("bqkv", nn.initializers.zeros, (3 * D,))
        wo = self.param("wo", nn.initializers.xavier_uniform(), (D, D))
        bo = self.param("bo", nn.initializers.zeros, (D,))
        aw = self.param("aw", nn.initializers.xavier_uniform(),
                        (D, self.query_dim))
        ab = self.param("ab", nn.initializers.zeros, (self.query_dim,))
        aq = self.param("aq", _uniform_pm(0.1), (self.query_dim,))
        cd = _dtype(self.compute_dtype)

        lead = x.shape[:-2]
        L = x.shape[-2]
        x2 = x.reshape(-1, L, D)
        mask2 = mask.reshape(-1, L)
        rate = 0.0 if deterministic else self.dropout

        if self.use_pallas:
            from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
                fused_news_encoder_diff,
            )
            from pytorch_news_recommender_tpu.parallel.sharded_embedding import (
                active_mesh,
            )
            if rate > 0.0:
                seed = jax.random.randint(
                    self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                    dtype=jnp.int32)
            else:
                seed = jnp.int32(0)
            # Data-parallel composition: with a registered multi-device mesh
            # the kernel MUST run under shard_map over the data axis — an
            # unwrapped pallas_call is opaque to the SPMD partitioner, which
            # silently replicates it (all-gathers the [M, L, D] block).
            # Resolve the axis by its configured NAME (registered alongside
            # the mesh by the Trainer — a caller-supplied mesh need not put
            # the data axis first); fall back to the leading axis only when
            # the registered name is absent from this mesh.
            from pytorch_news_recommender_tpu.parallel.sharded_embedding import (
                active_data_axis,
            )
            mesh = active_mesh()
            data_axis = None
            if mesh is not None and mesh.size > 1:
                name = active_data_axis()
                data_axis = (name if name in mesh.axis_names
                             else mesh.axis_names[0])
            out = fused_news_encoder_diff(
                x2.astype(cd), mask2,
                wqkv.astype(cd), bqkv.astype(cd), wo.astype(cd),
                bo.astype(cd), aw.astype(cd), ab.astype(cd), aq.astype(cd),
                num_heads=self.num_heads, dropout_rate=rate, seed=seed,
                interpret=self.pallas_interpret,
                mesh=mesh if data_axis is not None else None,
                data_axis=data_axis)
        else:
            h = A.multi_head_self_attention(
                x2.astype(cd), wqkv.astype(cd), bqkv.astype(cd),
                wo.astype(cd), bo.astype(cd), self.num_heads, mask2)
            if rate > 0.0:
                h = nn.Dropout(rate, deterministic=False)(h)
            out, wts = A.additive_attention_with_weights(
                h, aw.astype(cd), ab.astype(cd), aq.astype(cd), mask2)
            # No-op/DCE'd unless mutable=["intermediates"]; see
            # utils/inspect.py. The Pallas branch never materializes the
            # weights, so inspection uses the jnp path (same params).
            self.sow("intermediates", "attn_weights",
                     wts.reshape(*lead, L))
        return out.reshape(*lead, D)


class NewsEncoder(nn.Module):
    """Word-level news tower: embed -> MHSA -> dropout -> pool.

    Dropout sits ONLY after the MHSA, exactly like the reference tower
    (``nrms_v1.py:159-162``) — an earlier revision also dropped out the
    word embeddings, which is both off-reference and expensive (the
    bernoulli mask for ``[M*L, D]`` costs ~74M random bits per step).

    Operates on ``ids: [..., L]`` with any leading shape — history and
    candidate news for a whole batch are encoded in ONE call.
    """

    n_words: int
    word_embed_size: int
    num_heads: int
    query_dim: int
    dropout: float = 0.2
    compute_dtype: str = "float32"
    use_pallas: bool = False
    pallas_interpret: bool = False
    freeze_embeddings: bool = False
    embedding_lookup: str = "auto"
    a2a_capacity_factor: float = 2.0

    @nn.compact
    def __call__(self, ids: jax.Array, deterministic: bool = True) -> jax.Array:
        mask = (ids != 0).astype(jnp.float32)
        x = WordEmbedding(self.n_words, self.word_embed_size,
                          self.compute_dtype,
                          trainable=not self.freeze_embeddings,
                          embedding_lookup=self.embedding_lookup,
                          a2a_capacity_factor=self.a2a_capacity_factor,
                          name="word_embedding")(ids, mask)
        return AttentionPoolTower(
            model_dim=self.word_embed_size, num_heads=self.num_heads,
            query_dim=self.query_dim, dropout=self.dropout,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            name="tower")(x, mask, deterministic)


class UserEncoder(nn.Module):
    """User tower: MHSA over the encoded clicked-news sequence + pooling.

    No dropout, matching the reference user encoder
    (``nrms_v1.py:200-211``)."""

    model_dim: int
    num_heads: int
    query_dim: int
    compute_dtype: str = "float32"
    use_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(
        self,
        news_vecs: jax.Array,            # [B, H, D]
        mask: Optional[jax.Array] = None,  # [B, H]
    ) -> jax.Array:
        if mask is None:
            mask = jnp.ones(news_vecs.shape[:-1], jnp.float32)
        return AttentionPoolTower(
            model_dim=self.model_dim, num_heads=self.num_heads,
            query_dim=self.query_dim, dropout=0.0,
            compute_dtype=self.compute_dtype, use_pallas=self.use_pallas,
            pallas_interpret=self.pallas_interpret,
            name="tower")(news_vecs, mask, True)


class PositionwiseFeedForward(nn.Module):
    """GELU FFN with residual + LayerNorm (reference
    ``model/list_rank.py:100-128``)."""

    hidden_dim: int
    dropout: float = 0.2
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        D = x.shape[-1]
        cd = _dtype(self.compute_dtype)
        h = nn.Dense(self.hidden_dim, dtype=cd, name="fc1")(x)
        h = nn.gelu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Dense(D, dtype=cd, name="fc2")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.LayerNorm(dtype=cd, name="norm")(x + h)


class TransformerEncoderBlock(nn.Module):
    """MHSA + FFN block used by the listwise re-ranker
    (reference ``model/list_rank.py:210-220``)."""

    num_heads: int
    model_dim: int
    ff_dim: int
    dropout: float = 0.2
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        h = MultiHeadSelfAttention(self.num_heads, self.model_dim,
                                   self.compute_dtype, name="mhsa")(x, mask)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        x = nn.LayerNorm(dtype=_dtype(self.compute_dtype), name="norm")(x + h)
        return PositionwiseFeedForward(self.ff_dim, self.dropout,
                                       self.compute_dtype, name="ffn")(
            x, deterministic=deterministic)
