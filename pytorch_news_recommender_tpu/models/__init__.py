"""Model registry.

Replaces the reference's stringly dynamic import
(``MIND_2020/model/__init__.py:22-23`` — ``import_module('model.'+name)``)
with an explicit registry. Every model is a Flax module with the same calling
convention::

    scores = model.apply(variables, batch, news_feats,
                         deterministic=..., rngs={'dropout': ...})

where ``batch`` carries int32 news indices and ``news_feats`` the
device-resident feature tables.
"""

from __future__ import annotations

from typing import Callable, Dict

import flax.linen as nn

from pytorch_news_recommender_tpu.config import ModelConfig

_REGISTRY: Dict[str, Callable[[ModelConfig], nn.Module]] = {}


def register(name: str):
    def deco(fn):
        _REGISTRY[name] = fn
        return fn
    return deco


def available_models() -> list[str]:
    return sorted(_REGISTRY)


def build_model(cfg: ModelConfig) -> nn.Module:
    name = cfg.name.lower()
    if name not in _REGISTRY:
        raise KeyError(f"unknown model {cfg.name!r}; available: {available_models()}")
    return _REGISTRY[name](cfg)


# ---- registrations (import order defines the public model list) ----
from pytorch_news_recommender_tpu.models.nrms import NRMS


@register("nrms")
def _nrms(cfg: ModelConfig) -> nn.Module:
    return NRMS(cfg)


__all__ = ["build_model", "available_models", "register", "NRMS"]
