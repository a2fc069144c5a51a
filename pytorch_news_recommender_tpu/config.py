"""Typed, serializable configuration for the TPU-native news recommender.

Replaces the reference's single mutable ``Config`` object
(``/root/reference/MIND_2020/config.py:5-89``) with frozen dataclasses, dataset
presets, and artifact-derived sizes: vocabulary / category counts are read from
preprocessing metadata instead of being hand-synced constants
(cf. the "Remember to n_words = ..." print at
``/root/reference/MIND_2020/data_processor.py:193``).
"""

from __future__ import annotations

import dataclasses
import json
import pathlib
from typing import Any, Optional


def _asdict(obj: Any) -> Any:
    if dataclasses.is_dataclass(obj):
        return {f.name: _asdict(getattr(obj, f.name)) for f in dataclasses.fields(obj)}
    return obj


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset layout and fixed batch geometry.

    Sequence lengths mirror the reference semantics
    (``config.py:30-35``): title=20 words, abstract=40 words, history=50
    clicked news, 1 positive + ``sample_size`` negatives per training
    impression, eval candidate lists capped at ``max_candidate_size``.
    """

    dataset: str = "demo"               # demo | small | large | synthetic
    data_dir: str = "data_processed"
    n_words_title: int = 20
    n_words_abst: int = 40
    history_len: int = 50
    sample_size: int = 5                # negatives per positive
    max_candidate_size: int = 300       # eval candidate cap
    min_history: int = 5                # drop train users with shorter history
    word_freq_threshold: int = 3
    entity_nums: int = 10
    # Eval bucketing: impressions are padded to the smallest bucket that fits
    # instead of the reference's pad-everything-to-300
    # (``data_handler.py:177,200-234``).
    eval_buckets: tuple[int, ...] = (8, 16, 32, 64, 128, 300)

    @property
    def group_size(self) -> int:
        """Candidates per training sample: 1 positive + K negatives."""
        return 1 + self.sample_size


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Model-family hyperparameters (reference ``Config.__nrms__``,
    ``config.py:65-89``). Sizes that depend on preprocessing artifacts
    (``n_words``, ``category_nums``, ...) are filled in from
    :class:`ArtifactMeta` via :meth:`with_artifact_meta`."""

    name: str = "nrms"
    # artifact-derived (0 means "must be set from artifact metadata")
    n_words: int = 0
    n_news: int = 0
    category_nums: int = 0
    subcategory_nums: int = 0
    entity_nums: int = 0
    n_users: int = 0
    # embedding dims
    word_embed_size: int = 300
    cate_embed_size: int = 100
    bert_embed_size: int = 512
    entity_embed_size: int = 100
    # attention dims
    num_attention_heads: int = 10       # word-level MHSA heads (300 % 10 == 0)
    user_heads_num: int = 10            # user-encoder MHSA heads
    query_vector_dim: int = 200         # additive-attention projection
    query_vector_dim_large: int = 400
    # NAML / LSTUR CNN tower
    num_filters: int = 400
    kernel_size: int = 3
    # list_rank re-ranker
    list_num_heads: int = 8
    list_ff_dim: int = 512
    list_layers: int = 1
    list_title_size: int = 512          # reference title_size (config.py:66)
    # nrms_bert
    bert_trainable: bool = True         # reference freeze=False (nrms.py:222-224)
    # word-table analogue of torch Embedding.from_pretrained(freeze=...)
    # (reference nrms.py:121-123); True keeps GloVe rows fixed
    freeze_word_embeddings: bool = False
    # lstur
    long_short_term_method: str = "ini"  # 'ini' | 'con' (lstur.py:112-142)
    # disan
    disan_hidden: int = 0               # 0 -> word_embed_size
    # fastformer: depth of the additive-attention transformer stack. The
    # paper (arXiv:2108.09084) uses 2 for news rec; 1 measures better at
    # BOTH battery scales here (CPU 0.909 vs 0.900; v5e hardware battery
    # 0.954 vs 0.826 — the 2-layer stack is unstable early at lr 1e-2 /
    # batch 512) and is 1.55x faster (30.6 vs 47.5 ms/step) — QUALITY.md.
    fastformer_layers: int = 1
    # npa: personalized-attention query dim; 0 -> query_vector_dim // 2.
    # Smaller personalized queries learn markedly faster than the shared
    # additive-attention dim (benchmarks/npa_sweep.py: halving it moved
    # battery AUC 0.835 -> 0.898 @ 3 epochs at the swept-best lr).
    npa_query_dim: int = 0
    # tanr
    topic_loss_weight: float = 0.2      # aux topic-CE weight (TANR lambda)
    # hierec
    n_interests: int = 8
    # gnn
    gnn_layers: int = 2
    gnn_neighbors: int = 15
    dropout: float = 0.2
    # Length-bucketed unique-news encoding: deduped batches are partitioned
    # into a short block (every word feature fits the threshold; its arrays
    # are truncated to the threshold on device) and a full-length block.
    # Exact under the mask semantics — truncated columns are all-pad, and
    # every tower derives masks from ``ids != 0`` — while the encoder and
    # embedding-lookup cost of the short block drops with its length
    # (MIND titles average ~11.5 words vs the fixed 20-slot padding,
    # reference ``config.py:30``). 0 disables the split for that feature.
    short_title_len: int = 12
    short_abst_len: int = 0
    # Embedding-lookup schedule for the row-sharded word table when a model
    # axis is active (BASELINE north star: "row-sharded ... with all-to-all
    # gather for lookup"):
    #   "auto" — jit path; XLA inserts the collectives for the sharded take
    #   "psum" — hand schedule: local gather of owned rows + psum of partials
    #            over the model axis (parallel/sharded_embedding.py)
    #   "a2a"  — all-to-all dispatch: ids routed to their owner shard, rows
    #            returned over a second all-to-all. Bucket overflow is NEVER
    #            silent: the step's outputs are NaN-poisoned so a
    #            too-small ``a2a_capacity_factor`` surfaces immediately
    #            (pair with TrainConfig.skip_nonfinite_updates to skip, or
    #            debug_nans to halt).
    # All three produce identical forward values (tests/test_sharding.py);
    # on a 1-wide model axis every schedule falls back to the plain lookup.
    embedding_lookup: str = "auto"
    a2a_capacity_factor: float = 2.0
    # numerics
    compute_dtype: str = "bfloat16"     # activations/matmul inputs
    param_dtype: str = "float32"        # parameters + accumulations
    use_pallas: bool = True             # fused Pallas kernels on TPU
    pallas_interpret: bool = False      # interpreter-mode kernels (tests)
    # Use the MXU one-hot kernel for the dedup inverse-gather backward
    # instead of XLA's scatter-add. OFF by default: current XLA lowers the
    # TPU scatter sort-based and data-INDEPENDENT (measured ~1.5 ms at
    # U=12288/S=28672/D=300 even with every slot on one id, vs 2.5 ms for
    # the one-hot matmul). Keep as insurance for stacks whose scatter
    # lowering still serializes duplicate skew.
    dedup_gather_mxu: bool = False

    def with_artifact_meta(self, meta: "ArtifactMeta") -> "ModelConfig":
        return dataclasses.replace(
            self,
            n_words=meta.n_words,
            n_news=meta.n_news,
            category_nums=meta.category_nums,
            subcategory_nums=meta.subcategory_nums,
            entity_nums=meta.entity_nums,
            n_users=meta.n_users,
        )


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Optimization schedule (reference ``config.py:52-60`` +
    ``run_v0.py:46-47``: Adam lr=1e-3, batch 512, dropout 0.2, optional
    500-step linear warm-up, eval every 5000 steps)."""

    batch_size: int = 512
    eval_batch_size: int = 128
    learning_rate: float = 1e-3
    num_epochs: int = 6
    eval_step: int = 5000
    log_every: int = 100
    warm_up: bool = False
    warm_up_steps: int = 500
    weight_decay: float = 0.0
    grad_clip_norm: float = 0.0         # 0 = off
    # Optimizer family: "adam" (reference default, train_eval.py:48) or
    # "adafactor" (factored second moments — the memory-lean choice when
    # the word/news/entity tables dominate the train state at pod scale).
    # weight_decay > 0 upgrades adam to adamw.
    optimizer: str = "adam"
    # Accumulate gradients over N micro-batches before applying the update
    # (optax.MultiSteps): effective batch = N * batch_size without the HBM
    # cost of a bigger activation footprint. 1 = off. ``TrainState.step``
    # counts micro-steps; eval cadence is unchanged.
    grad_accum_steps: int = 1
    seed: int = 422
    # Encode each distinct news in a batch once (most history slots are pad
    # or repeated news) instead of per slot like the reference.
    dedup_batches: bool = True
    # Host-feed bucket grids (None = the loader's defaults,
    # ``loader.DEFAULT_UNIQUE_BUCKETS`` / ``loader.GNN_FRONTIER_BUCKETS``):
    # the static widths the dedup unique buffer and the GNN frontier
    # closure are padded to. Exposed so tiny-scale runs (tests, the driver
    # dryrun — production grids start at 1024/2048 and would fall back to
    # direct form there) and pod-scale tuning can size them.
    unique_buckets: Optional[tuple[int, ...]] = None
    gnn_frontier_buckets: Optional[tuple[int, ...]] = None
    # Eval via cached news vectors (two-tower) when the model supports it,
    # instead of re-encoding up to 300 candidates per impression.
    eval_two_tower: bool = True
    eval_encode_chunk: int = 4096
    auc_checkpoint_floor: float = 0.56  # min dev AUC before checkpointing
    max_dev_samples: int = 100_000      # reference truncates dev to 100k
    # Early stop after this many steps without a dev-AUC improvement,
    # checked at eval points. The reference declares the same knob
    # (``config.py:58`` require_improvement=5000) but its trigger flag is
    # never set (``train_eval.py:151-152``) — here it works. 0 = off.
    require_improvement: int = 0
    # Debug/determinism knobs (TPU equivalents of the reference's
    # cudnn.deterministic pin, run_v0.py:41 — SURVEY.md §5): jit-level NaN
    # checking; XLA deterministic ops are the default on TPU.
    debug_nans: bool = False
    # Production guard: when a step's loss is non-finite, keep the previous
    # train state instead of applying the poisoned update (a jit-internal
    # per-leaf select, ~0.1 ms at NRMS size). The step still counts and is
    # reported via the ``skipped`` metric. Off by default (exact reference
    # behavior: a NaN loss corrupts the run, train_eval.py:117-127).
    skip_nonfinite_updates: bool = False
    # Let XLA choose parameter memory layouts for the train step (AUTO
    # layouts). The word table + Adam moments prefer a transposed layout on
    # TPU; pinning the default row-major layout costs six 55 MB relayout
    # copies per step (~1 ms = 3% measured on v5e). OFF by default: params
    # then live in non-default layouts between steps, and host fetches of
    # such arrays are unreliable through tunneled/experimental backends
    # (observed INVALID_ARGUMENT on axon) — enable on a standard Cloud TPU
    # runtime after checking checkpoint saves round-trip.
    auto_layouts: bool = False
    # Force the multi-process feed path (per-process batch slices assembled
    # into global jax.Arrays via make_array_from_process_local_data) even in
    # a single-process run. The path activates automatically when
    # jax.process_count() > 1; this knob lets tests and the driver dryrun
    # exercise the exact code a 2-host run takes on a 1-process virtual mesh.
    sliced_feed: bool = False
    save_dir: str = "save_model"
    log_dir: str = "logs"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for pjit sharding. ``data`` is the batch axis
    (gradient all-reduce over ICI); ``model`` row-shards the large embedding
    tables with all-gather lookup."""

    data_axis: str = "data"
    model_axis: str = "model"
    model_parallel_size: int = 1        # 1 = pure data parallel

    def mesh_shape(self, n_devices: int) -> tuple[int, int]:
        mp = max(1, self.model_parallel_size)
        if n_devices % mp != 0:
            raise ValueError(
                f"n_devices={n_devices} not divisible by model_parallel_size={mp}"
            )
        return (n_devices // mp, mp)


@dataclasses.dataclass(frozen=True)
class Config:
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    train: TrainConfig = dataclasses.field(default_factory=TrainConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)
    description: str = ""

    # ---- serialization ----
    def to_dict(self) -> dict:
        return _asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict) -> "Config":
        def build(tp, sub):
            fields = {f.name: f for f in dataclasses.fields(tp)}
            kwargs = {}
            for k, v in sub.items():
                if k not in fields:
                    continue
                if isinstance(v, list):
                    v = tuple(v)
                kwargs[k] = v
            return tp(**kwargs)

        return cls(
            data=build(DataConfig, d.get("data", {})),
            model=build(ModelConfig, d.get("model", {})),
            train=build(TrainConfig, d.get("train", {})),
            mesh=build(MeshConfig, d.get("mesh", {})),
            description=d.get("description", ""),
        )

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def save(self, path: str | pathlib.Path) -> None:
        pathlib.Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "Config":
        return cls.from_json(pathlib.Path(path).read_text())


@dataclasses.dataclass(frozen=True)
class ArtifactMeta:
    """Sizes derived from preprocessing output. Written next to the arrays by
    ``data.mind`` / ``data.synthetic`` and consumed by
    :meth:`ModelConfig.with_artifact_meta` — never hand-edited."""

    n_words: int
    n_news: int
    category_nums: int
    subcategory_nums: int
    entity_nums: int = 0
    n_users: int = 0
    n_train_samples: int = 0
    n_dev_impressions: int = 0
    n_test_impressions: int = 0

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), indent=2)

    @classmethod
    def from_json(cls, s: str) -> "ArtifactMeta":
        d = json.loads(s)
        return cls(**{f.name: d[f.name] for f in dataclasses.fields(cls) if f.name in d})

    def save(self, path: str | pathlib.Path) -> None:
        pathlib.Path(path).write_text(self.to_json())

    @classmethod
    def load(cls, path: str | pathlib.Path) -> "ArtifactMeta":
        return cls.from_json(pathlib.Path(path).read_text())


# ---- presets -------------------------------------------------------------

def demo_config() -> Config:
    """CPU-tractable configuration mirroring the reference demo mode
    (``run_demo.py:20-61``: batch 256, small data)."""
    return Config(
        data=DataConfig(dataset="demo"),
        train=TrainConfig(batch_size=256, num_epochs=1, eval_step=1000),
    )


def large_config() -> Config:
    """MIND-large training configuration (``run_v0.py:46-47``)."""
    return Config(
        data=DataConfig(dataset="large"),
        train=TrainConfig(batch_size=512, num_epochs=6),
    )


def synthetic_config(**overrides) -> Config:
    """Tiny synthetic-data configuration used by tests and smoke benchmarks."""
    data = DataConfig(dataset="synthetic", eval_buckets=(8, 16, 32))
    model = ModelConfig(
        num_attention_heads=4,
        user_heads_num=4,
        word_embed_size=64,
        query_vector_dim=32,
        query_vector_dim_large=48,
        cate_embed_size=16,
        bert_embed_size=64,
        entity_embed_size=16,
        num_filters=32,
        list_ff_dim=64,
        list_num_heads=4,
        list_title_size=64,
        compute_dtype="float32",
        use_pallas=False,
    )
    train = TrainConfig(batch_size=32, eval_batch_size=32, num_epochs=1,
                        eval_step=10_000, max_dev_samples=10_000)
    cfg = Config(data=data, model=model, train=train)
    if overrides:
        d = cfg.to_dict()
        for k, v in overrides.items():
            section, _, field = k.partition(".")
            if field:
                d[section][field] = v
            else:
                d[k] = v
        cfg = Config.from_dict(d)
    return cfg


PRESETS = {
    "demo": demo_config,
    "large": large_config,
    "synthetic": synthetic_config,
}


# Per-family training-hparam defaults, applied where the family is CHOSEN
# (CLI `train`, sweep harnesses) — never silently inside the Trainer, so a
# library user's explicit Config is always taken literally. Precedent: the
# reference special-cases list_rank's sample_size=15 at the CLI
# (run_v0.py:44-45). npa's lr comes from the measured grid in
# benchmarks/npa_sweep.py: its personalized-attention parameterization
# learns ~10-20x-lr faster than the shared 1e-3 default (battery AUC
# 0.724 -> 0.898 @ 3 epochs together with the npa_query_dim halving).
FAMILY_TRAIN_DEFAULTS: dict = {
    "npa": {"learning_rate": 2e-2},
    # battery probe (models/fastformer.py): 0.849 @ shared 1e-3 ->
    # 0.900 @ 1e-2 (3 epochs, 2 layers); 2e-2 diverges (0.572)
    "fastformer": {"learning_rate": 1e-2},
}


def apply_family_defaults(d: dict, explicit: set = frozenset()) -> dict:
    """Overlay ``FAMILY_TRAIN_DEFAULTS[model.name]`` onto config-dict ``d``,
    skipping any train field named in ``explicit`` (user-passed flags win)."""
    for field, value in FAMILY_TRAIN_DEFAULTS.get(
            d.get("model", {}).get("name", ""), {}).items():
        if field not in explicit:
            d["train"][field] = value
    return d
