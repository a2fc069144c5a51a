"""Compute ops: pure-jnp reference implementations plus fused Pallas TPU
kernels for the hot paths. Modules call through the dispatchers here so the
jnp and Pallas paths stay interchangeable (the jnp path is also the golden
reference for kernel unit tests)."""

from pytorch_news_recommender_tpu.ops.attention import (
    additive_attention,
    dot_product_scores,
    multi_head_self_attention,
    scaled_dot_product_attention,
)

__all__ = [
    "additive_attention",
    "dot_product_scores",
    "multi_head_self_attention",
    "scaled_dot_product_attention",
]
