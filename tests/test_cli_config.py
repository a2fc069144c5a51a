"""CLI flag -> Config plumbing (no training; fast contract tier)."""

import argparse

from pytorch_news_recommender_tpu import cli


def _args(**over):
    base = dict(data="synthetic", model="nrms", batch_size=None,
                eval_batch_size=None, no_pallas=False, compute_dtype=None,
                model_parallel=1, embed_dim=None, heads=None)
    base.update(over)
    return argparse.Namespace(**base)


def test_geometry_flags_reach_model_config():
    cfg = cli._build_config(_args(embed_dim=384, heads=6))
    assert cfg.model.word_embed_size == 384
    assert cfg.model.num_attention_heads == 6
    assert cfg.model.user_heads_num == 6


def test_geometry_defaults_are_reference_dims():
    # non-synthetic data path starts from the reference-parity Config()
    cfg = cli._build_config(_args(data="artifacts"))
    assert cfg.model.word_embed_size == 300
    assert cfg.model.num_attention_heads == 10


def test_batch_and_dtype_flags():
    cfg = cli._build_config(_args(batch_size=128, compute_dtype="float32",
                                  no_pallas=True))
    assert cfg.train.batch_size == 128
    assert cfg.model.compute_dtype == "float32"
    assert cfg.model.use_pallas is False

def test_incompatible_embed_dim_heads_fails_loudly():
    # ADVICE r3: --embed-dim 384 with default H=10 used to fail much later
    # via a bare assert in models/layers.py:128.
    import pytest
    with pytest.raises(SystemExit, match="--heads"):
        cli._build_config(_args(data="artifacts", embed_dim=384))  # H=10
    with pytest.raises(SystemExit, match="not divisible"):
        cli._build_config(_args(embed_dim=300, heads=7))

def test_npa_family_lr_default_and_override():
    # npa ships its swept lr (benchmarks/npa_sweep.py) via
    # FAMILY_TRAIN_DEFAULTS; an explicit --lr always wins.
    cfg = cli._build_config(_args(model="npa"))
    assert cfg.train.learning_rate == 2e-2
    cfg = cli._build_config(_args(model="npa", lr=3e-4))
    assert cfg.train.learning_rate == 3e-4
    cfg = cli._build_config(_args(model="nrms"))
    assert cfg.train.learning_rate == 1e-3  # other families untouched
    # --lr 0.0 is an explicit value, not "unset" (falsy-zero review finding)
    cfg = cli._build_config(_args(model="npa", lr=0.0))
    assert cfg.train.learning_rate == 0.0
