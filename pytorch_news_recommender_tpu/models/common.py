"""Shared model base + plumbing for all recommender families.

Every model in the registry follows the same calling convention (see
``models/__init__.py``): ``__call__(batch, news_feats, deterministic)`` with
id-only batches, plus a two-tower serving API. :class:`RecModel` implements
the shared skeleton; a concrete family only defines

* ``encode_news_feats(feats, deterministic)`` — per-news feature dict with an
  arbitrary leading shape -> news vectors (the news tower), and/or override
  ``encode_news_ids`` when the tower owns a trainable per-news table
  (NRMS-BERT);
* ``score_impression(batch, browsed_ids, cand_ids, browsed_vecs, cand_vecs,
  deterministic)`` — the user tower + scoring head.

The base resolves the two batch forms:

* direct batches carry ``browsed_ids [B, H]`` / ``candidate_ids [B, S]``;
* deduplicated batches (``loader.dedup_batch``) carry ``unique_ids [U]`` plus
  inverse indices, so each distinct news in the batch is encoded exactly once
  (the reference encodes every slot separately,
  ``/root/reference/MIND_2020/model/nrms_v1.py:263-268``).

Feature gathers happen on device from the resident ``news_feats`` tables —
the host never re-assembles ``[B, 50, 20]`` word tensors per step like the
reference's ``data_handler.py:185-250``.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

Batch = Dict[str, jax.Array]


def gather_feats(news_feats: Batch, keys: Tuple[str, ...],
                 ids: jax.Array,
                 feat_trunc: Dict[str, int] | None = None) -> Batch:
    """Gather per-news feature rows for ``ids`` with any leading shape.

    ``feat_trunc`` truncates a word-axis feature to its first ``n`` columns
    (length-bucketed short block: the host guaranteed the dropped columns
    are all-pad, so the slice fuses into the gather and the result is
    exact — see ``loader.LengthSplit``)."""
    out = {}
    for k in keys:
        rows = jnp.take(news_feats[k], ids, axis=0)
        if feat_trunc and k in feat_trunc and rows.ndim >= 2:
            rows = rows[..., :feat_trunc[k]]
        out[k] = rows
    return out


class RecModel(nn.Module):
    """Base class: id-resolution skeleton shared by every model family."""

    # Which ``news_feats`` tables the news tower consumes (class constant on
    # each family — intentionally NOT annotated, so flax's dataclass
    # transform leaves it alone).
    FEAT_KEYS = ("title",)

    # Families whose news vectors are user-independent (everyone but NPA)
    # support the cached two-tower eval/serving path.
    TWO_TOWER = True

    # Families whose news tower is exact under word-axis truncation of
    # all-pad columns (masks derived from ``ids != 0``) opt into
    # length-bucketed unique-news encoding (``loader.LengthSplit``). GNN
    # opts out: it expands NEIGHBOR titles whose lengths the host criterion
    # never checked.
    LENGTH_SPLIT_OK = True

    # Families that sow auxiliary losses (flax ``losses`` collection) set
    # this True; the trainer then applies with ``mutable=["losses"]``.
    # Measured on v5e: tracing EVERY family with mutable collections
    # ballooned the train-step compile ~10x (35s -> 500s) and steady-state
    # step time ~15x — so the mutable path is strictly opt-in.
    HAS_AUX_LOSS = False

    # ---- news tower ----
    def encode_news_feats(self, feats: Batch,
                          deterministic: bool = True) -> jax.Array:
        """``{feat: [..., ...]}`` -> ``[..., D]`` news vectors."""
        raise NotImplementedError

    def encode_news_ids(self, ids: jax.Array, news_feats: Batch,
                        deterministic: bool = True,
                        feat_trunc: Dict[str, int] | None = None) -> jax.Array:
        """``[...]`` int news ids -> ``[..., D]`` news vectors.

        Default: gather ``FEAT_KEYS`` rows on device, run the feature tower.
        Models with trainable per-news tables (NRMS-BERT) override this.
        ``feat_trunc`` (length-bucketed short block) truncates word-axis
        features — see :func:`gather_feats`.
        """
        return self.encode_news_feats(
            gather_feats(news_feats, self.FEAT_KEYS, ids, feat_trunc),
            deterministic)

    def _feat_trunc(self) -> Dict[str, int]:
        """Word-feature truncation lengths for the short block, from config
        (``short_title_len``/``short_abst_len``); must agree with the host
        criterion in ``loader.LengthSplit`` (built by
        ``Trainer._make_length_split``)."""
        c = getattr(self, "cfg", None)
        out = {}
        for feat, attr in (("title", "short_title_len"),
                           ("abst", "short_abst_len")):
            n = int(getattr(c, attr, 0) or 0) if c is not None else 0
            if n > 0 and feat in self.FEAT_KEYS:
                out[feat] = n
        return out

    # ---- user tower + scoring head ----
    def score_impression(
        self,
        batch: Batch,
        browsed_ids: jax.Array,    # [B, H] int32 (0 = pad)
        cand_ids: jax.Array,       # [B, S] int32 (0 = pad)
        browsed_vecs: jax.Array,   # [B, H, D]
        cand_vecs: jax.Array,      # [B, S, D]
        news_feats: Batch | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Encoded impression -> ``[B, S]`` float32 scores (pads at -1e9).

        ``news_feats`` is provided so heads that condition on side features
        (e.g. HieRec's category-indexed interests) can gather them by id;
        dot-product heads ignore it.
        """
        raise NotImplementedError

    # ---- shared skeleton ----
    def resolve_batch(
        self, batch: Batch, news_feats: Batch, deterministic: bool = True,
    ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
        """Resolve a (direct or deduplicated) batch into
        ``(browsed_ids, cand_ids, browsed_vecs, cand_vecs)``."""
        if "unique_ids" in batch:
            unique_ids = batch["unique_ids"]                       # [U]
            ws = (batch["short_mark"].shape[0]
                  if "short_mark" in batch else 0)                 # static
            nb = (batch["block_mark"].shape[0]
                  if "block_mark" in batch else 1)                 # static
            if nb > 1 and ws > 0 and self.LENGTH_SPLIT_OK:
                # Multi-process feed: the unique buffer is nb per-process
                # blocks, EACH partitioned [short ws/nb | long] at one
                # agreed width (loader.train_batches_sliced). Encode all
                # blocks' shorts truncated and longs full-length, then
                # restore the block layout — indices already point into it.
                U = unique_ids.shape[0]
                W = U // nb
                wsl = ws // nb
                u2 = unique_ids.reshape(nb, W)
                v_s = self.encode_news_ids(
                    u2[:, :wsl].reshape(-1), news_feats, deterministic,
                    feat_trunc=self._feat_trunc())
                v_l = self.encode_news_ids(
                    u2[:, wsl:].reshape(-1), news_feats, deterministic)
                D = v_s.shape[-1]
                uvecs = jnp.concatenate(
                    [v_s.reshape(nb, wsl, D), v_l.reshape(nb, W - wsl, D)],
                    axis=1).reshape(U, D)
            elif ws >= unique_ids.shape[0] and self.LENGTH_SPLIT_OK:
                # Everything is short (possible only when the long block is
                # empty): one truncated encode — a zero-width long slice
                # would hand the Pallas kernel an M=0 grid.
                uvecs = self.encode_news_ids(
                    unique_ids, news_feats, deterministic,
                    feat_trunc=self._feat_trunc())
            elif ws > 0 and self.LENGTH_SPLIT_OK:
                # Length-bucketed encode: the short block's word features are
                # truncated (host-verified all-pad columns), cutting its MHSA
                # + embedding-lookup cost by ~threshold/L.
                v_s = self.encode_news_ids(
                    unique_ids[:ws], news_feats, deterministic,
                    feat_trunc=self._feat_trunc())
                v_l = self.encode_news_ids(
                    unique_ids[ws:], news_feats, deterministic)
                uvecs = jnp.concatenate([v_s, v_l], axis=0)
            else:
                uvecs = self.encode_news_ids(unique_ids, news_feats,
                                             deterministic)
            browsed_ids = jnp.take(unique_ids, batch["browsed_idx"], axis=0)
            cand_ids = jnp.take(unique_ids, batch["candidate_idx"], axis=0)
            # The inverse gather's backward is a scatter-add with extreme
            # duplicate skew (the pad news alone owns ~half the history
            # slots). Current XLA lowers the TPU scatter sort-based and
            # data-independent (~1.5 ms at batch-512 shapes, faster than the
            # 2.5 ms MXU one-hot — measured, see docs/DESIGN.md), so plain
            # take is the default; ``dedup_gather_mxu`` re-enables the
            # kernel on stacks whose scatter still serializes skew.
            c = getattr(self, "cfg", None)
            if (c is not None and getattr(c, "use_pallas", False)
                    and getattr(c, "dedup_gather_mxu", False)):
                from pytorch_news_recommender_tpu.ops.pallas.segment_scatter \
                    import dedup_gather
                take = functools.partial(
                    dedup_gather,
                    interpret=getattr(c, "pallas_interpret", False))
            else:
                take = functools.partial(jnp.take, axis=0)
            browsed_vecs = take(uvecs, batch["browsed_idx"])
            cand_vecs = take(uvecs, batch["candidate_idx"])
        else:
            browsed_ids = batch["browsed_ids"]
            cand_ids = batch["candidate_ids"]
            H = browsed_ids.shape[1]
            all_ids = jnp.concatenate([browsed_ids, cand_ids], axis=1)
            vecs = self.encode_news_ids(all_ids, news_feats, deterministic)
            browsed_vecs, cand_vecs = vecs[:, :H], vecs[:, H:]
        return browsed_ids, cand_ids, browsed_vecs, cand_vecs

    def __call__(self, batch: Batch, news_feats: Batch,
                 deterministic: bool = True) -> jax.Array:
        """Score candidates for each impression.

        Args:
          batch: either direct form — ``browsed_ids [B, H]``,
            ``candidate_ids [B, S]`` int32 news indices (0 = pad; real news
            start at 1 as in the reference's ``+1`` index mapping,
            ``data_handler.py:60-66``) — or deduplicated form from
            ``loader.dedup_batch``.
          news_feats: device-resident per-news feature tables.
        Returns:
          ``[B, S]`` float32 scores, padded candidates at ``-1e9``.
        """
        b_ids, c_ids, b_vecs, c_vecs = self.resolve_batch(
            batch, news_feats, deterministic)
        return self.score_impression(batch, b_ids, c_ids, b_vecs, c_vecs,
                                     news_feats, deterministic)

    def score_from_vecs(self, batch: Batch, news_vecs: jax.Array,
                        news_feats: Batch | None = None) -> jax.Array:
        """Two-tower fast path: look impression vectors up from a precomputed
        corpus table (reference two-tower API ``nrms_v0.py:278-312``, but with
        the whole corpus encoded once instead of re-encoding 300 candidates
        per impression)."""
        browsed_ids = batch["browsed_ids"]
        cand_ids = batch["candidate_ids"]
        browsed_vecs = jnp.take(news_vecs, browsed_ids, axis=0)
        cand_vecs = jnp.take(news_vecs, cand_ids, axis=0)
        return self.score_impression(batch, browsed_ids, cand_ids,
                                     browsed_vecs, cand_vecs, news_feats, True)


def corpus_encode_levelwise(model, n_layers: int, params, news_feats: Batch,
                            chunk: int, fn_cache: dict | None = None
                            ) -> jax.Array:
    """Whole-corpus news vectors for a ``CORPUS_LEVELWISE`` family (GNN):
    titles once for every news, then one full-table GAT pass per layer —
    ``1 + L`` chunked passes instead of expanding the ``1 + K + ... + K^L``
    title subtree per news (which does not even compile at a 50k corpus,
    BASELINE.md round-5). The SINGLE implementation behind both
    ``Trainer.compute_news_vectors`` (eval — passes its ``_score_fns`` as
    ``fn_cache`` so the jitted passes persist across evals) and
    ``serve.Recommender`` (one-shot corpus-cache bring-up). The jitted
    functions close over ``news_feats``, so a reused ``fn_cache`` must
    belong to the same table set."""
    cache = fn_cache if fn_cache is not None else {}
    L = max(1, n_layers)
    if "lw_title_chunk" not in cache:
        cache["lw_title_chunk"] = jax.jit(lambda p, ids: model.apply(
            {"params": p}, ids, news_feats, True, method="encode_title_ids"))
        for li in range(L):
            cache[("lw_gat_chunk", li)] = jax.jit(functools.partial(
                lambda p, ids, T, h, _li: model.apply(
                    {"params": p}, ids, T, h, news_feats, _li,
                    method="gat_chunk"),
                _li=li))

    n = int(news_feats["title"].shape[0])

    def chunked(fn, *extra):
        outs = []
        for s in range(0, n, chunk):
            ids = jnp.arange(s, min(s + chunk, n), dtype=jnp.int32)
            if ids.shape[0] < chunk:
                ids = jnp.pad(ids, (0, chunk - ids.shape[0]))
            outs.append(fn(params, ids, *extra))
        return jnp.concatenate(outs, axis=0)[:n]

    T = chunked(cache["lw_title_chunk"])
    h = T
    # deepest layer first — the same per-depth assignment as the recursive
    # node_repr (models/gnn.py)
    for li in reversed(range(L)):
        h = chunked(cache[("lw_gat_chunk", li)], T, h)
    return h
