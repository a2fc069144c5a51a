"""GNN news-graph model: message passing over a precomputed news-news graph
with attention readout.

The second north-star extension from BASELINE.json (config 5: "GNN news-user
graph model ... message passing + attention readout") — no reference
implementation exists, so the design is TPU-first from scratch:

* an OFFLINE news-news graph (co-click / same-topic neighbors) is stored as a
  dense ``neighbors [N, K]`` feature table (row 0 = pad news, id 0 entries =
  missing neighbors) — fixed fan-out instead of ragged adjacency keeps every
  shape static for XLA;
* news tower = NRMS title tower for the node itself AND its K neighbors, then
  ``gnn_layers`` rounds of GAT-style aggregation: per-edge additive attention
  logits, masked softmax over the neighborhood, weighted sum fused with the
  self vector through a gated residual;
* user tower = attention readout over the history (NRMS user tower);
  dot-product scoring.

Depth-d neighborhoods are materialized by recursive gather
(``ids -> neighbors[ids]``), so a 2-layer model encodes ``1 + K + K^2``
titles per news; with batch dedup (``loader.dedup_batch``) each distinct
news's subtree is encoded once per step. All aggregation is einsum-only —
no scatters, no dynamic shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from pytorch_news_recommender_tpu.config import ModelConfig
from pytorch_news_recommender_tpu.models.common import Batch, RecModel
from pytorch_news_recommender_tpu.models.layers import NewsEncoder, UserEncoder
from pytorch_news_recommender_tpu.ops.attention import NEG_INF, dot_product_scores


class GATLayer(nn.Module):
    """Single-round neighborhood aggregation with additive edge attention."""

    model_dim: int
    compute_dtype: str = "float32"

    @nn.compact
    def __call__(
        self,
        self_vecs: jax.Array,    # [..., D]
        neigh_vecs: jax.Array,   # [..., K, D]
        neigh_mask: jax.Array,   # [..., K] (1 = real neighbor)
    ) -> jax.Array:
        D = self.model_dim
        cd = jnp.dtype(self.compute_dtype)
        wq = self.param("wq", nn.initializers.xavier_uniform(), (D, D))
        wk = self.param("wk", nn.initializers.xavier_uniform(), (D, D))
        a = self.param("a", nn.initializers.xavier_uniform(), (2 * D, 1))

        q = jnp.einsum("...d,de->...e", self_vecs.astype(cd), wq.astype(cd))
        k = jnp.einsum("...kd,de->...ke", neigh_vecs.astype(cd), wk.astype(cd))
        qk = jnp.concatenate(
            [jnp.broadcast_to(q[..., None, :], k.shape), k], axis=-1)
        logits = nn.leaky_relu(
            jnp.einsum("...ke,ef->...kf", qk, a.astype(cd))[..., 0]
        ).astype(jnp.float32)
        logits = jnp.where(neigh_mask > 0, logits, NEG_INF)
        att = jax.nn.softmax(logits, axis=-1)
        att = att * jnp.any(neigh_mask > 0, axis=-1, keepdims=True)
        agg = jnp.einsum("...k,...kd->...d", att.astype(cd),
                         neigh_vecs.astype(cd),
                         preferred_element_type=jnp.float32).astype(cd)
        gate = nn.sigmoid(nn.Dense(D, dtype=cd, name="gate")(
            jnp.concatenate([self_vecs.astype(cd), agg], axis=-1)))
        return gate * self_vecs.astype(cd) + (1 - gate) * agg


class GNNRec(RecModel):
    """Graph-enhanced news encoder + attention-readout user tower."""

    cfg: ModelConfig

    FEAT_KEYS = ("title", "neighbors")

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
        self.gat_layers = [
            GATLayer(model_dim=c.word_embed_size,
                     compute_dtype=c.compute_dtype, name=f"gat{i}")
            for i in range(max(1, c.gnn_layers))
        ]
        self.user_encoder = UserEncoder(
            model_dim=c.word_embed_size,
            num_heads=c.user_heads_num,
            query_dim=c.query_vector_dim,
            compute_dtype=c.compute_dtype,
            use_pallas=c.use_pallas,
            pallas_interpret=c.pallas_interpret,
        )

    # Message passing gathers NEIGHBOR titles, whose lengths the host's
    # short/long criterion never checked — truncation would be lossy.
    LENGTH_SPLIT_OK = False

    # Trainer wires ``loader.add_gnn_frontier`` into the host feed: batches
    # then carry the deduplicated neighborhood closure and the title tower
    # runs once per DISTINCT news in it (vs 1+K+K^2 encodes per unique news
    # on the recursive fallback path).
    WANTS_GNN_FRONTIER = True
    # Eval/serving corpus encode runs level-wise over the whole table
    # (titles once, then one GAT pass per layer) instead of per-chunk
    # recursive expansion — Trainer.compute_news_vectors.
    CORPUS_LEVELWISE = True

    def __call__(self, batch: Batch, news_feats: Batch,
                 deterministic: bool = True) -> jax.Array:
        if "gnn_frontier_ids" in batch:
            unique_ids = batch["unique_ids"]
            uvecs = self._encode_frontier(batch, news_feats, deterministic)
            browsed_ids = jnp.take(unique_ids, batch["browsed_idx"], axis=0)
            cand_ids = jnp.take(unique_ids, batch["candidate_idx"], axis=0)
            browsed_vecs = jnp.take(uvecs, batch["browsed_idx"], axis=0)
            cand_vecs = jnp.take(uvecs, batch["candidate_idx"], axis=0)
            return self.score_impression(batch, browsed_ids, cand_ids,
                                         browsed_vecs, cand_vecs, news_feats,
                                         deterministic)
        return super().__call__(batch, news_feats, deterministic)

    def _encode_frontier(self, batch: Batch, news_feats: Batch,
                         deterministic: bool) -> jax.Array:
        """Frontier-deduplicated encode: titles once for the whole closure,
        then the GAT stack level-wise with position gathers. Produces values
        identical to the recursive path (``tests/test_gnn_frontier.py``):
        level ``l`` is garbage on nodes deeper than ``depth - l`` (their
        out-of-closure neighbors are masked), but those entries are never
        gathered by any shallower level."""
        fids = batch["gnn_frontier_ids"]                  # [F]
        nbr_pos = batch["gnn_nbr_pos"]                    # [F, K]
        T = self.news_encoder(
            jnp.take(news_feats["title"], fids, axis=0), deterministic)
        neigh_ids = jnp.take(fids, nbr_pos, axis=0)       # [F, K]
        mask = (neigh_ids != 0).astype(jnp.float32)
        h = T
        # deepest layer first: h_1 = gat[L-1](T, T[nbr]), ...,
        # h_L = gat[0](T, h_{L-1}[nbr]) — the same per-depth layer
        # assignment as the recursive node_repr
        for layer in reversed(self.gat_layers):
            h = layer(T, jnp.take(h, nbr_pos, axis=0), mask)
        return jnp.take(h, batch["gnn_self_pos"], axis=0)  # [U, D]

    # ---- corpus-level-wise eval/serving encode (Trainer hooks) ----
    def encode_title_ids(self, ids: jax.Array, news_feats: Batch,
                         deterministic: bool = True) -> jax.Array:
        """Title tower only (level-0 representations)."""
        return self.news_encoder(
            jnp.take(news_feats["title"], ids, axis=0), deterministic)

    def gat_chunk(self, ids: jax.Array, titles_tab: jax.Array,
                  h_prev: jax.Array, news_feats: Batch,
                  layer_idx: int) -> jax.Array:
        """One GAT level for a chunk of news ids, gathering neighbor
        representations from the FULL previous-level table (indexed by news
        id — the corpus table needs no frontier remap)."""
        neigh = jnp.take(news_feats["neighbors"], ids, axis=0)
        neigh = neigh * (ids != 0)[..., None]
        mask = (neigh != 0).astype(jnp.float32)
        return self.gat_layers[layer_idx](
            jnp.take(titles_tab, ids, axis=0),
            jnp.take(h_prev, neigh, axis=0), mask)

    def encode_news_ids(self, ids: jax.Array, news_feats: Batch,
                        deterministic: bool = True,
                        feat_trunc=None) -> jax.Array:
        titles = news_feats["title"]
        neighbors = news_feats["neighbors"]

        def node_repr(node_ids: jax.Array, depth: int) -> jax.Array:
            self_vecs = self.news_encoder(
                jnp.take(titles, node_ids, axis=0), deterministic)
            if depth == 0:
                return self_vecs
            neigh_ids = jnp.take(neighbors, node_ids, axis=0)   # [..., K]
            # pad news (id 0) keeps an all-pad neighborhood
            neigh_ids = neigh_ids * (node_ids != 0)[..., None]
            neigh_vecs = node_repr(neigh_ids, depth - 1)        # [..., K, D]
            mask = (neigh_ids != 0).astype(jnp.float32)
            layer = self.gat_layers[len(self.gat_layers) - depth]
            return layer(self_vecs, neigh_vecs, mask)

        return node_repr(ids, len(self.gat_layers))

    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        """Feature-only path (fresh-news ingestion,
        ``serve.Recommender.encode_new_news``): the item is encoded as an
        ISOLATED node — title tower, then the GAT stack over an empty
        neighborhood (all-masked aggregate; the gates pass the self
        vector). This matches the corpus levelwise encode of a node whose
        neighbor row is all-pad, so an ingested vector is consistent with
        the cached corpus table. A feature dict cannot carry the
        neighbors' OWN titles, so graph context is by definition
        unavailable here; edges appear at the next offline graph rebuild.
        Any ``neighbors`` ids present in ``feats`` are deliberately
        ignored (the serve flow passes the all-pad row)."""
        T = self.news_encoder(feats["title"], deterministic)
        K = max(1, int(self.cfg.gnn_neighbors))
        zeros = jnp.zeros(T.shape[:-1] + (K, T.shape[-1]), T.dtype)
        mask = jnp.zeros(T.shape[:-1] + (K,), jnp.float32)
        # For an isolated node every level collapses to gate(T, 0)*T with
        # only the OUTERMOST layer's gate surviving (deeper levels feed
        # exclusively through the masked-out aggregate), so a single
        # gat_layers[0] application IS the exact levelwise result — do not
        # "chain" layers here, that would misread as message passing.
        return self.gat_layers[0](T, zeros, mask)

    def score_impression(self, batch, browsed_ids, cand_ids, browsed_vecs,
                         cand_vecs, news_feats=None,
                         deterministic: bool = True) -> jax.Array:
        hist_mask = (browsed_ids != 0).astype(jnp.float32)
        user_vec = self.user_encoder(browsed_vecs, hist_mask)
        return dot_product_scores(user_vec, cand_vecs, (cand_ids != 0))
