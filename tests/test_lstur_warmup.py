"""LSTUR long/short-term variants + optimizer warm-up schedule."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_news_recommender_tpu.config import Config
from pytorch_news_recommender_tpu.data.loader import train_batches
from pytorch_news_recommender_tpu.train.loop import Trainer, make_optimizer


def _trainer(cfg, full_dataset, **model_over):
    d = cfg.to_dict()
    d["model"].update(name="lstur", **model_over)
    d["train"]["batch_size"] = 16
    return Trainer(Config.from_dict(d), full_dataset)


def test_lstur_con_variant(cfg, full_dataset):
    trainer = _trainer(cfg, full_dataset, long_short_term_method="con")
    state = trainer.init_state(seed=0)
    batch = next(train_batches(full_dataset.train, 16,
                               np.random.default_rng(0)))
    state, metrics = trainer.run_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    # 'con': GRU dim + user-embed dim partition the news dim
    m = trainer.model
    # user embedding table exists at half-ish dims
    emb = state.params["user_embedding"]["embedding"]
    news_dim = (trainer.model_cfg.num_filters
                + 2 * trainer.model_cfg.cate_embed_size)
    assert emb.shape[1] == news_dim - news_dim // 2


def test_lstur_unknown_user_zero_longterm(cfg, full_dataset):
    """User id 0 must contribute a zero long-term vector (masked-user
    semantics)."""
    trainer = _trainer(cfg, full_dataset)
    state = trainer.init_state(seed=0)
    emb = np.asarray(state.params["user_embedding"]["embedding"])
    batch = next(train_batches(full_dataset.train, 8,
                               np.random.default_rng(0)))
    b0 = dict(batch)
    b0["user_ids"] = np.zeros_like(b0["user_ids"])
    fn = trainer.score_fn()
    feats = trainer.news_feats
    s_zero = np.asarray(fn(state.params, {k: jnp.asarray(v) for k, v in b0.items()}, feats))
    assert np.all(np.isfinite(s_zero[batch["candidate_ids"] != 0]))


def test_warmup_schedule():
    """LR ramps linearly to base over warm_up_steps (reference
    lr_scheduler.py:11-52)."""
    import optax

    cfg = Config.from_dict({
        "train": {"warm_up": True, "warm_up_steps": 10, "learning_rate": 1e-3}
    })
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones((4,))}
    opt_state = tx.init(params)
    grads = {"w": jnp.ones((4,))}
    # step sizes grow during warm-up
    deltas = []
    for _ in range(12):
        updates, opt_state = tx.update(grads, opt_state, params)
        deltas.append(float(jnp.abs(updates["w"][0])))
    assert deltas[0] < deltas[5] < deltas[9]
    # post warm-up, Adam at constant base LR -> stable magnitude
    assert abs(deltas[10] - deltas[11]) < 1e-5


def test_lstur_bfloat16_compute_dtype(full_dataset):
    """LSTUR under compute_dtype=bfloat16: the GRU scan carry must keep one
    dtype (f32 cell outputs against a bf16 carry crashed the init on
    hardware — caught by the Adressa battery, round 3)."""
    import jax

    from pytorch_news_recommender_tpu.config import Config, synthetic_config
    from pytorch_news_recommender_tpu.train.loop import Trainer

    d = synthetic_config().to_dict()
    d["model"]["name"] = "lstur"
    d["model"]["compute_dtype"] = "bfloat16"
    d["train"]["batch_size"] = 8
    trainer = Trainer(Config.from_dict(d), full_dataset)
    state = trainer.init_state(seed=0)
    from pytorch_news_recommender_tpu.data.loader import train_batches
    import numpy as np
    batch = next(train_batches(full_dataset.train, 8,
                               np.random.default_rng(0)))
    state, m = trainer.run_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(m["loss"]))
