"""Test harness: force an 8-device virtual CPU mesh so multi-chip sharding is
exercised without TPU hardware (SURVEY.md §4 strategy; JAX docs pattern)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402  (import after env setup)

# The hosted axon TPU plugin overrides JAX_PLATFORMS from the environment, so
# pin the platform via config too (before any backend initialization).
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from pytorch_news_recommender_tpu.config import synthetic_config  # noqa: E402
from pytorch_news_recommender_tpu.data import synthetic  # noqa: E402


@pytest.fixture(scope="session")
def cfg():
    return synthetic_config()


@pytest.fixture(scope="session")
def dataset(cfg):
    return synthetic.generate(cfg.data, seed=0, n_train=512, n_dev=64)


@pytest.fixture(scope="session")
def full_dataset(cfg):
    """Synthetic dataset with every optional feature populated (BERT vectors,
    user identities, graph neighbors) — exercises all model families."""
    return synthetic.generate(cfg.data, seed=1, n_train=512, n_dev=64,
                              bert_dim=64, n_users=50, n_neighbors=8,
                              n_entities=32, entity_dim=16)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
