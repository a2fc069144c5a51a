"""Fused Pallas TPU kernels for the hot paths.

The reference's hot math (per-news MHSA + additive pooling,
``MIND_2020/model/nrms_v1.py:128-162``) has pathological TPU shapes when
expressed op-by-op: 20x20 attention scores with head_dim 30 tile to
(8,128)/(16,128) MXU/VPU blocks at ~25x waste — measured 60 ms of a 75 ms
forward at MIND scale. These kernels keep the whole encoder chain in VMEM and
pack multiple news items per tile so the attention runs on sane shapes.
"""

from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
    fused_news_encoder,
)

__all__ = ["fused_news_encoder"]
