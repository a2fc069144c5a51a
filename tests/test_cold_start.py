"""Cold-start contract: an ALL-PAD history (new user, serving's day-one
case) must produce finite scores in every family — masked pooling should
collapse to a zero-ish user vector, never NaN (a masked softmax over an
empty support degenerates to uniform weights over garbage rows; the
guard is that those rows are zeroed/masked downstream)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_news_recommender_tpu import models as M
from pytorch_news_recommender_tpu.config import Config
from pytorch_news_recommender_tpu.train.loop import Trainer


def _check(name, cfg, full_dataset):
    d = cfg.to_dict()
    d["model"]["name"] = name
    tr = Trainer(Config.from_dict(d), full_dataset)
    state = tr.init_state(seed=0)
    rng = np.random.default_rng(0)
    batch = {"browsed_ids": jnp.zeros((4, 6), jnp.int32),
             "candidate_ids": jnp.asarray(
                 rng.integers(1, 20, (4, 3)).astype(np.int32))}
    if name == "npa":
        batch["user_ids"] = jnp.zeros((4,), jnp.int32)
    s = tr.model.apply({"params": state.params}, batch, tr.news_feats,
                       deterministic=True)
    if isinstance(s, tuple):
        s = s[0]
    assert bool(jnp.all(jnp.isfinite(jnp.asarray(s)))), name


@pytest.mark.parametrize("name", ["nrms", "nrms_bert"])
def test_cold_start_finite_fast(name, cfg, full_dataset):
    _check(name, cfg, full_dataset)


@pytest.mark.parametrize("name", sorted(set(M.available_models())
                                        - {"nrms", "nrms_bert"}))
def test_cold_start_finite(name, cfg, full_dataset):
    _check(name, cfg, full_dataset)
