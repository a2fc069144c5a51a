"""Component-level timing of the NRMS train step on the attached accelerator.

Isolates: full step, forward-only, fused encoder fwd / fwd+bwd, embedding
gather+scatter fwd+bwd, user tower, optimizer update — using the
chain-N-steps-then-fetch method from bench.py (axon tunnel: only host fetches
force execution).

Run: python benchmarks/profile_step.py [--batch 512]
"""

from __future__ import annotations

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, *args, n_lo=3, n_hi=10, fetch=None, chain=False):
    """Marginal ms/call over repeated (or, with ``chain``, state-chained)
    invocations — ``chain`` is required for donated-arg functions. Returns
    ``(ms, last)`` — with ``chain`` the caller's first arg was DONATED, so it
    must continue from ``last``, never the original."""
    import jax
    f = fetch or (lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0][:1]))
    cur = fn(*args)
    f(cur)
    times = {}
    for n in (n_lo, n_hi):
        t0 = time.perf_counter()
        last = cur
        for _ in range(n):
            last = fn(last, *args[1:]) if chain else fn(*args)
        f(last)
        times[n] = time.perf_counter() - t0
        if chain:
            cur = last
    return (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3, cur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.data.loader import train_batches
    from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
        fused_news_encoder, fused_news_encoder_diff,
    )
    from pytorch_news_recommender_tpu.train.loop import Trainer, softmax_ce_loss

    B = args.batch
    cfg = Config(
        data=DataConfig(dataset="synthetic"),
        model=ModelConfig(
            word_embed_size=300, num_attention_heads=10, user_heads_num=10,
            query_vector_dim=200, compute_dtype="bfloat16", use_pallas=True,
        ),
        train=TrainConfig(batch_size=B),
    )
    ds = synthetic.generate(cfg.data, seed=0, n_news=50000, vocab_size=45800,
                            n_train=8 * B, n_dev=8, title_len=(11.5, 3.5))
    trainer = Trainer(cfg, ds)
    rng = jax.random.PRNGKey(0)
    log(f"devices: {jax.devices()}")

    batches = list(train_batches(ds.train, B, np.random.default_rng(0),
                                 dedup=True,
                                 length_split=trainer._length_split))
    uw = [b["unique_ids"].shape[0] if "unique_ids" in b
          else b["browsed_ids"].size + b["candidate_ids"].size
          for b in batches]
    sw = sorted({b.get("short_mark", np.zeros(0)).shape[0] for b in batches})
    slots = B * (cfg.data.history_len + cfg.data.group_size)
    log(f"slots/batch: {slots}, dedup widths: {sorted(set(uw))}, "
        f"short widths: {sw}")

    state = trainer.init_state(seed=0)

    def fetch_state(s):
        return float(jnp.sum(s.params["news_encoder"]["tower"]["wqkv"][0, :2]))

    # 1. full train step
    def full(state):
        s, _ = trainer.run_step(state, batches[0], rng)
        return s
    ms, state = timeit(full, state, fetch=fetch_state, chain=True)
    log(f"full train step:          {ms:8.2f} ms  ({B/ms*1e3:,.0f} ex/s)")

    # 2. forward + loss only (no grad)
    shards = trainer._batch_shardings(batches[0])
    dev_batch = {k: jax.device_put(jnp.asarray(v), shards[k])
                 for k, v in batches[0].items()}

    # news_feats must be an ARGUMENT: closing over device arrays embeds them
    # as compile-time constants, which forces a host fetch at trace time
    # (fails/stalls through the axon tunnel).
    dev_feats = {k: jnp.asarray(v) for k, v in trainer.news_feats.items()}

    @jax.jit
    def fwd_only(params, batch, feats, r):
        scores = trainer.model.apply(
            {"params": params}, batch, feats,
            deterministic=False, rngs={"dropout": r})
        return softmax_ce_loss(scores)
    ms, _ = timeit(fwd_only, state.params, dev_batch, dev_feats, rng,
                fetch=lambda o: float(o))
    log(f"forward+loss only:        {ms:8.2f} ms")

    # 3. fused encoder alone (fwd), M = dedup width
    M = max(uw)
    L, D, Q = 20, 300, 200
    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (M, L, D), jnp.bfloat16)
    mask = jnp.ones((M, L), jnp.float32)
    p = {n: jax.random.normal(jax.random.fold_in(key, i), s, jnp.bfloat16)
         for i, (n, s) in enumerate({
             "wqkv": (D, 3 * D), "bqkv": (3 * D,), "wo": (D, D),
             "bo": (D,), "aw": (D, Q), "ab": (Q,), "aq": (Q,)}.items())}

    @jax.jit
    def enc_fwd(x, mask):
        return fused_news_encoder(
            x, mask, p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["aw"],
            p["ab"], p["aq"], num_heads=10, dropout_rate=0.0)
    ms, _ = timeit(enc_fwd, x, mask,
                fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"fused encoder fwd (M={M}): {ms:8.2f} ms")

    # 4. fused encoder fwd+bwd
    @jax.jit
    def enc_grad(x, mask):
        def loss(x):
            return jnp.sum(fused_news_encoder_diff(
                x, mask, p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["aw"],
                p["ab"], p["aq"], num_heads=10,
                dropout_rate=0.2, seed=7).astype(jnp.float32))
        return jax.grad(loss)(x)
    ms, _ = timeit(enc_grad, x, mask, fetch=lambda o: np.asarray(o[:1, :1, :1]))
    log(f"fused encoder fwd+bwd:    {ms:8.2f} ms")

    # 4b. XLA (unfused) encoder fwd+bwd at same M for comparison
    from pytorch_news_recommender_tpu.ops import attention as A

    @jax.jit
    def xla_grad(x, mask):
        def loss(x):
            h = A.multi_head_self_attention(
                x, p["wqkv"], p["bqkv"], p["wo"], p["bo"], 10, mask)
            out = A.additive_attention(h, p["aw"], p["ab"], p["aq"], mask)
            return jnp.sum(out.astype(jnp.float32))
        return jax.grad(loss)(x)
    ms, _ = timeit(xla_grad, x, mask, fetch=lambda o: np.asarray(o[:1, :1, :1]))
    log(f"XLA encoder fwd+bwd:      {ms:8.2f} ms")

    # 5. embedding gather + scatter-add (fwd+bwd) at dedup scale
    table = jax.random.normal(key, (45800, 300), jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, 45800, size=(M, L)), jnp.int32)

    @jax.jit
    def emb_grad(table, ids):
        def loss(t):
            e = jnp.take(t, ids, axis=0).astype(jnp.bfloat16)
            return jnp.sum(e.astype(jnp.float32) ** 2)
        return jax.grad(loss)(table)
    ms, _ = timeit(emb_grad, table, ids, fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"embedding fwd+bwd (scatter): {ms:8.2f} ms")

    # 6. user tower fwd+bwd ([B, 50, D])
    xu = jax.random.normal(key, (B, 50, D), jnp.bfloat16)
    masku = jnp.ones((B, 50), jnp.float32)

    @jax.jit
    def user_grad(xu):
        def loss(x):
            return jnp.sum(fused_news_encoder_diff(
                x, masku, p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["aw"],
                p["ab"], p["aq"], num_heads=10,
                dropout_rate=0.0, seed=3).astype(jnp.float32))
        return jax.grad(loss)(xu)
    ms, _ = timeit(user_grad, xu, fetch=lambda o: np.asarray(o[:1, :1, :1]))
    log(f"user tower fwd+bwd:       {ms:8.2f} ms")

    # 7. optimizer update alone
    tx = optax.adam(1e-3)
    opt_state = tx.init(state.params)

    @jax.jit
    def opt_step(params, opt_state):
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_opt
    ms, _ = timeit(opt_step, state.params, opt_state,
                fetch=lambda o: np.asarray(
                    jax.tree_util.tree_leaves(o[0])[0])[:1])
    log(f"optimizer update:         {ms:8.2f} ms")


if __name__ == "__main__":
    main()
