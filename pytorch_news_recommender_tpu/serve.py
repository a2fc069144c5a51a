"""Serving API: checkpoint -> ready-to-score recommender.

The reference exposes a two-tower serving-style API on one model only
(``nrms_v0.py:278-312``: ``get_news_vector`` / ``get_user_vector`` /
``get_prediction``) and never packages it. Here every RecModel family serves
through the same object:

* news tower runs ONCE over the whole corpus at load time (chunked
  ``encode_news_ids``) -> resident ``[N, D]`` vector table;
* ``score(history, candidates)`` runs only the user tower + head per request
  (a few microseconds of FLOPs at serving batch sizes);
* ``top_k(history, k)`` scores the ENTIRE corpus with one
  ``[D] @ [D, N]`` matmul + ``lax.top_k`` — corpus-wide retrieval at MXU
  speed (dot-product families; interaction-head families like ``list_rank``
  can re-rank the retrieved shortlist with ``score``).

All request paths are fixed-shape jitted functions (history padded to
``history_len``, candidate lists padded to a small set of widths), so
serving never recompiles.

``corpus_cache="int8"`` stores the resident vector table symmetrically
quantized per row (int8 values + one f32 scale per news): 4x smaller than
f32 — 10M news x 300d fits in ~3 GB HBM instead of 12 — and corpus-wide
retrieval streams a quarter of the bytes (the bandwidth win matters at
multi-million-news corpora; at 50k news request latency is RTT-dominated
either way). Dequantization happens inside the jitted request paths (a
per-row multiply XLA fuses into the gather/matmul); ranking agreement with
the float cache is recall@10 = 1.00 on the synthetic corpus
(``tests/test_serve.py``, ``benchmarks/serve_bench.py``).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_news_recommender_tpu.config import Config
from pytorch_news_recommender_tpu.data.dataset import RecDataset
from pytorch_news_recommender_tpu.models import build_model


class Recommender:
    """Loaded model + precomputed corpus vectors, ready to answer requests."""

    def __init__(
        self,
        cfg: Config,
        dataset: RecDataset,
        params,
        candidate_widths: Sequence[int] = (8, 16, 32, 64, 300),
        corpus_cache: str = "native",
        vectors_file: Optional[str] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.mesh = mesh  # shard the corpus cache over its devices (set
        #                   AFTER the tables are built, below)
        self.model_cfg = cfg.model.with_artifact_meta(dataset.meta)
        self.model = build_model(self.model_cfg)
        if not getattr(self.model, "TWO_TOWER", True):
            raise ValueError(
                f"model family '{cfg.model.name}' has user-conditioned news "
                "vectors (TWO_TOWER=False) and cannot serve from a cached "
                "corpus table; score per request with Trainer.score_fn()")
        self.params = params
        self.news_feats = {k: jnp.asarray(v)
                           for k, v in dataset.news.as_dict().items()}
        self.H = cfg.data.history_len
        self.data_cfg = cfg.data
        # preprocessing dictionaries (word/category/... -> 1-based id) for
        # tokenizing NEWS THAT WERE NOT IN THE TRAINING CORPUS (the
        # reference persists these as word_dict.csv / entity_ids_dict.pkl)
        self.dicts = dataset.dicts
        self.widths = tuple(sorted(candidate_widths))
        self._score_fns: Dict[int, callable] = {}

        if corpus_cache not in ("native", "int8"):
            raise ValueError(f"corpus_cache must be native|int8, "
                             f"got {corpus_cache!r}")
        self.corpus_cache = corpus_cache

        n = dataset.news.n_news
        pre_q = None
        if vectors_file is not None:
            # Precomputed table from ``cli export-vectors`` — skips the
            # startup corpus encode entirely (the file must come from the
            # SAME checkpoint; n_news is validated).
            z = np.load(vectors_file)
            if "news_q" in z:
                pre_q = (jnp.asarray(z["news_q"]),
                         jnp.asarray(z["news_scale"]))
                n_file = z["news_q"].shape[0]
                if corpus_cache != "int8":
                    raise ValueError(
                        "vectors_file holds an int8 table; pass "
                        "corpus_cache='int8' to serve from it")
                vecs = None
            else:
                vecs = jnp.asarray(z["news_vectors"])
                n_file = vecs.shape[0]
            if n_file != n:
                raise ValueError(f"vectors_file has {n_file} rows, dataset "
                                 f"has {n} news")
        elif getattr(self.model, "CORPUS_LEVELWISE", False):
            # graph families: titles once + one GAT pass per layer over the
            # full table — the per-chunk recursive expansion does not even
            # compile at production corpus scale (BASELINE.md round-5)
            from pytorch_news_recommender_tpu.models.common import (
                corpus_encode_levelwise,
            )
            vecs = corpus_encode_levelwise(
                self.model, max(1, int(self.model_cfg.gnn_layers)), params,
                self.news_feats, cfg.train.eval_encode_chunk)[:n]
        else:
            # encode the whole corpus once
            chunk = cfg.train.eval_encode_chunk
            enc = jax.jit(lambda p, ids: self.model.apply(
                {"params": p}, ids, self.news_feats, True,
                method="encode_news_ids"))
            outs = []
            for s in range(0, n, chunk):
                ids = jnp.arange(s, min(s + chunk, n), dtype=jnp.int32)
                if ids.shape[0] < chunk:
                    ids = jnp.pad(ids, (0, chunk - ids.shape[0]))
                outs.append(enc(params, ids))
            vecs = jnp.concatenate(outs, axis=0)[:n]

        if pre_q is not None:
            self.news_q, self.news_scale = pre_q
            self.news_vecs = None
        elif corpus_cache == "int8":
            # Symmetric per-row quantization: q = round(v / s), s = amax/127.
            # One jitted pass; the float table never persists.
            @jax.jit
            def quantize(v):
                v = v.astype(jnp.float32)
                s = jnp.max(jnp.abs(v), axis=1, keepdims=True) / 127.0
                s = jnp.maximum(s, 1e-12)  # all-zero pad row
                q = jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)
                return q, s
            self.news_q, self.news_scale = quantize(vecs)
            self.news_vecs = None
        else:
            self.news_vecs = vecs

        self._cd = jnp.dtype(self.model_cfg.compute_dtype)
        self.n_news = int(n)   # REAL news count; tables may be over-allocated
        self._topk_fn = jax.jit(self._topk_impl, static_argnums=(3,))

        if mesh is not None:
            # --mesh serve mode: row-shard the corpus cache over the mesh
            # devices so corpora larger than one chip's HBM serve from the
            # whole slice; XLA shards the top_k matmul over the rows and
            # all-gathers only the [B, k] result. Lookup paths gather
            # sharded rows via collectives (fine at request batch sizes).
            from jax.sharding import NamedSharding, PartitionSpec as P
            axis = mesh.axis_names[0]
            shard = NamedSharding(mesh, P(axis, None))

            def put(t):
                # Rows that don't divide the mesh are zero-PADDED up to the
                # next multiple (the top_k path already masks rows beyond
                # n_news, and lookups never request them) — a silent
                # replicated fallback here made `--mesh` benchmarks measure
                # the wrong path (ADVICE r2).
                if t is None:
                    return t
                pad = (-t.shape[0]) % mesh.shape[axis]
                if pad:
                    t = jnp.concatenate(
                        [jnp.asarray(t),
                         jnp.zeros((pad,) + t.shape[1:], t.dtype)], axis=0)
                return jax.device_put(t, shard)
            if self.corpus_cache == "int8":
                self.news_q = put(self.news_q)
                self.news_scale = put(self.news_scale)
            else:
                self.news_vecs = put(self.news_vecs)

    def _tables(self) -> tuple:
        """The corpus cache as a jit-argument tuple (so table UPDATES from
        :meth:`add_news` flow into already-compiled request paths without
        retracing — the tables are arguments, never closure constants)."""
        if self.corpus_cache == "int8":
            return (self.news_q, self.news_scale)
        return (self.news_vecs,)

    def _lookup(self, ids: jax.Array, tables: tuple) -> jax.Array:
        """Cached corpus rows for ``ids`` (dequantized when int8)."""
        if self.corpus_cache == "int8":
            q, scale = tables
            rows = jnp.take(q, ids, axis=0).astype(jnp.float32)
            s = jnp.take(scale, ids, axis=0)
            return (rows * s).astype(self._cd)
        return jnp.take(tables[0], ids, axis=0)

    @classmethod
    def from_checkpoint(cls, ckpt_dir, dataset: RecDataset,
                        **kw) -> "Recommender":
        """Load config + params from an Orbax checkpoint dir (see
        ``train/checkpoint.py``)."""
        from pytorch_news_recommender_tpu.train.checkpoint import (
            CheckpointManager, load_config,
        )
        from pytorch_news_recommender_tpu.train.loop import Trainer

        cfg = load_config(ckpt_dir)
        trainer = Trainer(cfg, dataset)
        state = CheckpointManager(ckpt_dir).restore(trainer.init_state())
        return cls(cfg, dataset, state.params, **kw)

    # ---- request paths ----
    def _pad_history(self, history: Sequence[int]) -> np.ndarray:
        h = np.zeros(self.H, np.int32)
        hist = [int(x) for x in history][-self.H:]
        h[self.H - len(hist):] = hist
        return h

    def _width_for(self, n: int) -> int:
        for w in self.widths:
            if n <= w:
                return w
        return self.widths[-1]

    def _score_fn(self, w: int):
        if w not in self._score_fns:
            # Mirrors RecModel.score_from_vecs (models/common.py) with the
            # cache-mode lookup swapped in; keep the two in sync.
            def score_w(p, batch, tables):
                b, c = batch["browsed_ids"], batch["candidate_ids"]
                return self.model.apply(
                    {"params": p}, batch, b, c,
                    self._lookup(b, tables), self._lookup(c, tables),
                    self.news_feats, True,
                    method="score_impression")
            self._score_fns[w] = jax.jit(score_w)
        return self._score_fns[w]

    def score(self, history: Sequence[int],
              candidates: Sequence[int],
              user_id: int = 0) -> np.ndarray:
        """Scores for an explicit candidate list (any family)."""
        w = self._width_for(len(candidates))
        cand = np.zeros(w, np.int32)
        cand[:len(candidates)] = np.asarray(candidates[:w], np.int32)
        batch = {
            "browsed_ids": jnp.asarray(self._pad_history(history))[None],
            "candidate_ids": jnp.asarray(cand)[None],
            "user_ids": jnp.asarray([user_id], jnp.int32),
        }
        s = np.asarray(
            self._score_fn(w)(self.params, batch, self._tables()))[0]
        return s[:len(candidates)]

    # The batched path pads every request group to this fixed batch size —
    # ONE compiled executable per candidate width, warmable at startup
    # (``RecommenderServer.warmup``). An earlier (1, 2, 4, 8, 16, 32)
    # batch-size ladder minimized padding FLOPs but meant 6 executables per
    # width compiled lazily under live traffic — on a degraded remote
    # compile server that showed up as multi-second p99 spikes. Padding a
    # [B, 50]-history user-tower pass to B=32 costs well under a
    # millisecond on the MXU.
    BATCH_PAD = 32

    def score_many(
        self,
        requests: Sequence[tuple[Sequence[int], Sequence[int], int]],
    ) -> list[np.ndarray]:
        """Score many ``(history, candidates, user_id)`` requests with
        batched jit calls: requests group by candidate-width bucket, each
        group padded to :data:`BATCH_PAD` rows (chunked when larger), so
        concurrent traffic rides one MXU pass per group instead of one
        dispatch per request (fed by the HTTP daemon's batching window)."""
        out: list = [None] * len(requests)
        groups: Dict[int, list] = {}
        for i, (hist, cands, uid) in enumerate(requests):
            groups.setdefault(self._width_for(len(cands)), []).append(i)
        B = self.BATCH_PAD
        for w, idxs in groups.items():
            for s0 in range(0, len(idxs), B):
                chunk = idxs[s0:s0 + B]
                browsed = np.zeros((B, self.H), np.int32)
                cand = np.zeros((B, w), np.int32)
                users = np.zeros(B, np.int32)
                for j, i in enumerate(chunk):
                    hist, cands, uid = requests[i]
                    browsed[j] = self._pad_history(hist)
                    cand[j, :len(cands)] = np.asarray(cands[:w], np.int32)
                    users[j] = uid
                batch = {
                    "browsed_ids": jnp.asarray(browsed),
                    "candidate_ids": jnp.asarray(cand),
                    "user_ids": jnp.asarray(users),
                }
                s = np.asarray(self._score_fn(w)(self.params, batch,
                                                 self._tables()))
                for j, i in enumerate(chunk):
                    out[i] = s[j, :len(requests[i][1])]
        return out

    def _topk_impl(self, params, batch, tables, k: int, n_real):
        # corpus-wide dot-product retrieval: user vector against every news
        b_ids = batch["browsed_ids"]
        browsed_vecs = self._lookup(b_ids, tables)
        # reuse the family's head on a length-1 candidate list to extract
        # the user vector is model-specific; dot-product families share the
        # user_encoder attribute.
        hist_mask = (b_ids != 0).astype(jnp.float32)
        user_vec = self.model.apply(
            {"params": params}, browsed_vecs, hist_mask,
            method=lambda m, v, mk: m.user_encoder(v, mk))
        if self.corpus_cache == "int8":
            # int8 rows stream from HBM (the convert fuses into the matmul);
            # per-row dequant folds into the score afterwards.
            q, scale = tables
            raw = jnp.einsum("bd,nd->bn", user_vec.astype(jnp.float32),
                             q.astype(jnp.float32))
            scores = raw * scale[:, 0][None, :]
        else:
            scores = jnp.einsum("bd,nd->bn", user_vec.astype(jnp.float32),
                                tables[0].astype(jnp.float32))
        n_alloc = scores.shape[1]
        # mask the pad news (row 0) and unused over-allocated capacity rows
        valid = (jnp.arange(n_alloc)[None, :] >= 1) & (
            jnp.arange(n_alloc)[None, :] < n_real)
        scores = jnp.where(valid, scores, -jnp.inf)
        top_scores, top_ids = jax.lax.top_k(scores, k)
        return top_ids, top_scores

    def top_k(self, history: Sequence[int], k: int = 10):
        """Corpus-wide retrieval (dot-product families)."""
        batch = {"browsed_ids": jnp.asarray(self._pad_history(history))[None]}
        ids, scores = self._topk_fn(self.params, batch, self._tables(), k,
                                    jnp.int32(self.n_news))
        return np.asarray(ids)[0], np.asarray(scores)[0]

    # ---- fresh-news ingestion ----
    GROW_BLOCK = 256   # corpus tables over-allocate in blocks so repeated
    #                    add_news calls recompile the (shape-keyed) request
    #                    paths only once per block, not once per news

    def tokenize_new_news(self, title: str, abstract: str = "",
                          category: str = "", subcategory: str = "",
                          entities: Sequence[str] = ()) -> Dict[str, np.ndarray]:
        """Feature rows for a news item NOT in the training corpus, using the
        persisted preprocessing dictionaries and the exact pipeline
        tokenization (lowercase + digit-strip + ``\\w+`` + in-vocab — see
        ``data/mind.py``; reference ``data_processor.py:151-219``)."""
        if not self.dicts or "word" not in self.dicts:
            raise ValueError(
                "dataset has no persisted dictionaries (dicts.json) — "
                "re-run preprocessing with this version to enable "
                "fresh-news tokenization")
        from pytorch_news_recommender_tpu.data import mind
        d = self.data_cfg
        word = self.dicts["word"]
        out: Dict[str, np.ndarray] = {
            "title": np.asarray(
                mind._to_ids(title, word, d.n_words_title), np.int32),
            "abst": np.asarray(
                mind._to_ids(abstract, word, d.n_words_abst), np.int32),
            "categ": np.int32(self.dicts.get("category", {}).get(category, 0)),
            "subcateg": np.int32(
                self.dicts.get("subcategory", {}).get(subcategory, 0)),
        }
        ent_dict = self.dicts.get("entity", {})
        eids = [ent_dict.get(q, 0) for q in entities]
        eids = [e for e in eids if e][:d.entity_nums]
        ent = np.zeros(d.entity_nums, np.int32)
        ent[:len(eids)] = eids
        out["entity"] = ent
        if "neighbors" in self.news_feats:
            # graph families: a fresh item has no co-click edges yet, and
            # the all-pad neighborhood is the exact representation of that
            # (the GAT layers gate an empty aggregate; GNNRec's
            # encode_news_feats matches the corpus encode for an isolated
            # node). Edges appear at the next offline graph rebuild.
            K = int(self.news_feats["neighbors"].shape[1])
            out["neighbors"] = np.zeros(K, np.int32)
        return out

    def encode_new_news(self, title: str, abstract: str = "",
                        category: str = "", subcategory: str = "",
                        entities: Sequence[str] = ()) -> np.ndarray:
        """News-tower vector for a fresh news item (``[D]`` float)."""
        keys = self.model.FEAT_KEYS
        if "bert" in keys:
            raise ValueError(
                f"model family '{self.cfg.model.name}' encodes news from "
                "precomputed per-news vectors; fresh news needs an external "
                "vector, not tokenization")
        rows = self.tokenize_new_news(title, abstract, category,
                                      subcategory, entities)
        missing = [k for k in keys if k not in rows]
        if missing:
            raise ValueError(f"cannot build features {missing} for a fresh "
                             f"news item (family '{self.cfg.model.name}')")
        feats = {k: jnp.asarray(rows[k])[None] for k in keys}
        if "encode_new" not in self._score_fns:
            self._score_fns["encode_new"] = jax.jit(
                lambda p, f: self.model.apply(
                    {"params": p}, f, True, method="encode_news_feats"))
        vec = self._score_fns["encode_new"](self.params, feats)
        return np.asarray(vec[0])

    def add_news(self, title: str, abstract: str = "", category: str = "",
                 subcategory: str = "", entities: Sequence[str] = ()) -> int:
        """Ingest a fresh news item: tokenize with the pipeline dictionaries,
        encode through the news tower, append to the corpus cache AND the
        resident feature tables. Returns the new news id (usable in
        ``score``/``top_k`` immediately).

        The vector tables grow in ``GROW_BLOCK`` steps and are jit ARGUMENTS
        of the request paths, so adds within a block reuse the compiled
        executables; the feature tables (side-feature families only) are
        closure-captured, so the per-width score fns are dropped on add and
        re-trace lazily."""
        vec = jnp.asarray(self.encode_new_news(
            title, abstract, category, subcategory, entities))
        nid = self.n_news

        def grown(table, row):
            cap = table.shape[0]
            if nid >= cap:
                pad = np.zeros((self.GROW_BLOCK,) + table.shape[1:],
                               np.asarray(table).dtype)
                table = jnp.concatenate([table, jnp.asarray(pad)], axis=0)
                if self.mesh is not None:
                    # --mesh mode: re-apply the row sharding after a block
                    # reallocation so the corpus cache stays distributed
                    # (spec rank must match the table: feature tables like
                    # categ ids are rank-1)
                    from jax.sharding import NamedSharding, PartitionSpec as P
                    axis = self.mesh.axis_names[0]
                    if table.shape[0] % self.mesh.shape[axis] == 0:
                        spec = P(axis, *([None] * (table.ndim - 1)))
                        table = jax.device_put(
                            table, NamedSharding(self.mesh, spec))
            return table.at[nid].set(row)

        if self.corpus_cache == "int8":
            s = float(jnp.maximum(jnp.max(jnp.abs(vec)) / 127.0, 1e-12))
            q = jnp.clip(jnp.round(vec / s), -127, 127).astype(jnp.int8)
            self.news_q = grown(self.news_q, q)
            self.news_scale = grown(self.news_scale,
                                    jnp.asarray([s], jnp.float32))
        else:
            self.news_vecs = grown(self.news_vecs, vec.astype(
                self.news_vecs.dtype))

        # resident feature tables: append the tokenized rows so
        # side-feature score heads (HieRec) see the new news too
        rows = self.tokenize_new_news(title, abstract, category,
                                      subcategory, entities)
        for k in list(self.news_feats):
            if k in rows:
                self.news_feats[k] = grown(self.news_feats[k],
                                           jnp.asarray(rows[k]))
        # feature tables are closure-captured by the per-width score fns
        for w in list(self._score_fns):
            if isinstance(w, int):
                del self._score_fns[w]
        if self.dicts is not None and "news" in self.dicts:
            self.dicts["news"][f"__fresh_{nid}"] = nid
        self.n_news = nid + 1
        return nid
