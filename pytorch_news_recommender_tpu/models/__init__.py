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
from pytorch_news_recommender_tpu.models.naml import NAML
from pytorch_news_recommender_tpu.models.nrms_bert import NRMSBert


@register("nrms")
def _nrms(cfg: ModelConfig) -> nn.Module:
    return NRMS(cfg)


@register("naml")
def _naml(cfg: ModelConfig) -> nn.Module:
    return NAML(cfg)


@register("nrms_bert")
def _nrms_bert(cfg: ModelConfig) -> nn.Module:
    return NRMSBert(cfg)


from pytorch_news_recommender_tpu.models.list_rank import ListRank
from pytorch_news_recommender_tpu.models.lstur import LSTUR


@register("list_rank")
def _list_rank(cfg: ModelConfig) -> nn.Module:
    return ListRank(cfg)


@register("lstur")
def _lstur(cfg: ModelConfig) -> nn.Module:
    return LSTUR(cfg)


from pytorch_news_recommender_tpu.models.disan import DiSANRec
from pytorch_news_recommender_tpu.models.fastformer import Fastformer
from pytorch_news_recommender_tpu.models.gnn import GNNRec
from pytorch_news_recommender_tpu.models.hierec import HieRec
from pytorch_news_recommender_tpu.models.nrms_entity import NRMSEntity
from pytorch_news_recommender_tpu.models.npa import NPA
from pytorch_news_recommender_tpu.models.tanr import TANR


@register("nrms_entity")
def _nrms_entity(cfg: ModelConfig) -> nn.Module:
    return NRMSEntity(cfg)


@register("tanr")
def _tanr(cfg: ModelConfig) -> nn.Module:
    return TANR(cfg)


@register("disan")
def _disan(cfg: ModelConfig) -> nn.Module:
    return DiSANRec(cfg)


@register("hierec")
def _hierec(cfg: ModelConfig) -> nn.Module:
    return HieRec(cfg)


@register("gnn")
def _gnn(cfg: ModelConfig) -> nn.Module:
    return GNNRec(cfg)


@register("npa")
def _npa(cfg: ModelConfig) -> nn.Module:
    return NPA(cfg)


@register("fastformer")
def _fastformer(cfg: ModelConfig) -> nn.Module:
    return Fastformer(cfg)


__all__ = ["build_model", "available_models", "register",
           "NRMS", "NAML", "NRMSBert", "ListRank", "LSTUR",
           "DiSANRec", "HieRec", "GNNRec", "NRMSEntity", "TANR", "NPA",
           "Fastformer"]
