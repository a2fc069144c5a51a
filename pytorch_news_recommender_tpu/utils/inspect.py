"""Attention-weight inspection.

The reference ships a TensorBoard hook that logs additive-attention weights
but leaves it commented out (``/root/reference/MIND_2020/model/nrms_v0.py:
94-122``, writer wiring ``train_eval.py:25,57``). This is the working
TPU-native version: every :class:`models.layers.AdditiveAttention` sows its
softmax weights into the flax ``intermediates`` collection, and
:func:`attention_maps` runs one (non-jitted-hot-path) apply with that
collection mutable to retrieve them.

Use a model built with ``use_pallas=False`` for inspection — the fused Pallas
encoder never materializes the weights (params are identical, so the same
checkpoint loads into either).
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np


def _flatten(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else str(k)
            out.update(_flatten(v, key))
    elif isinstance(tree, (tuple, list)):
        # sow appends one entry per call within an apply; usually length 1.
        for i, v in enumerate(tree):
            key = f"{prefix}[{i}]" if len(tree) > 1 else prefix
            out.update(_flatten(v, key))
    else:
        out[prefix] = np.asarray(tree)
    return out


def attention_maps(model, params, batch, news_feats) -> Dict[str, np.ndarray]:
    """Score ``batch`` and return every additive-attention weight tensor.

    Returns a flat dict ``{module_path: weights}`` where each leaf is the
    ``[..., L]`` softmax distribution of one AdditiveAttention site (news
    tower: over title words; user tower: over the 50-history axis).
    """
    _, inter = model.apply(
        {"params": params}, batch, news_feats, True,
        mutable=["intermediates"],
    )
    flat = _flatten(inter["intermediates"])
    return {k.replace("/attn_weights", ""): v for k, v in flat.items()}


def attention_summary(maps: Dict[str, np.ndarray]) -> Dict[str, Dict[str, float]]:
    """Scalar summaries per attention site (what the reference hook would
    have sent to TensorBoard): mean/max weight and mean normalized entropy
    (1.0 = uniform attention, 0.0 = one-hot)."""
    out: Dict[str, Dict[str, float]] = {}
    for name, w in maps.items():
        L = w.shape[-1]
        p = np.clip(w, 1e-12, 1.0)
        ent = -(p * np.log(p)).sum(-1) / np.log(L)
        out[name] = {
            "mean": float(w.mean()),
            "max": float(w.max()),
            "entropy": float(ent.mean()),
            "seq_len": float(L),
        }
    return out
