"""TPU-native news-recommendation framework (JAX/XLA/Pallas/pjit).

A from-scratch rebuild of the capabilities of the PyTorch reference
``0215Arthur/Pytorch_News_Recommender`` (mounted read-only at
``/root/reference``), designed TPU-first: fused Pallas kernels for the
attention towers, device-resident news feature tables, SPMD sharding over a
``jax.sharding.Mesh``, and impression-level AUC/MRR/nDCG evaluation.
"""

__version__ = "0.1.0"

from pytorch_news_recommender_tpu.config import (
    ArtifactMeta,
    Config,
    DataConfig,
    MeshConfig,
    ModelConfig,
    TrainConfig,
)

__all__ = [
    "Config",
    "DataConfig",
    "ModelConfig",
    "TrainConfig",
    "MeshConfig",
    "ArtifactMeta",
]
