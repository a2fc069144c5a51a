"""Headline benchmark: NRMS training throughput (examples/sec/chip).

Runs on whatever accelerator JAX exposes (the real TPU chip under the driver).
Measures the framework's fused, id-only-batch training step at reference
dimensions (MIND: vocab 45800, 300-d GloVe, 10 heads, history 50, 1+5
candidates, batch 512 — ``/root/reference/MIND_2020/config.py`` +
``run_v0.py:46``).

``vs_baseline`` compares against a faithful *reference-structure* step
measured on the SAME chip: per-news-slot Python-loop encoder calls (the
reference's ``nrms_v1.py:263-268`` launches one kernel per news slot) fed
with host-assembled ``[B, 56, 20]`` word tensors per step (reference
``data_handler.py:185-250`` + per-forward ``.to(device)``). The reference
repo publishes no throughput numbers (SURVEY.md §6), so identical-hardware
structural comparison is the honest baseline available.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "examples/sec/chip", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.config import (
        Config, DataConfig, ModelConfig, TrainConfig,
    )
    from pytorch_news_recommender_tpu.data import synthetic
    from pytorch_news_recommender_tpu.data.loader import train_batches
    from pytorch_news_recommender_tpu.train.loop import Trainer, softmax_ce_loss

    BATCH = 512
    STEPS = 30

    cfg = Config(
        data=DataConfig(dataset="synthetic"),
        model=ModelConfig(
            word_embed_size=300, num_attention_heads=10, user_heads_num=10,
            query_vector_dim=200, compute_dtype="bfloat16", use_pallas=True,
        ),
        train=TrainConfig(batch_size=BATCH),
    )
    ds = synthetic.generate(cfg.data, seed=0, n_news=2000, vocab_size=45800,
                            n_train=4 * BATCH, n_dev=8)
    trainer = Trainer(cfg, ds)
    state = trainer.init_state(seed=0)
    rng = jax.random.PRNGKey(0)
    batches = list(train_batches(ds.train, BATCH, np.random.default_rng(0)))

    # ---- ours: id-only batches, fused batched encoder ----
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    state, m = trainer.run_step(state, batches[0], rng)  # compile
    jax.block_until_ready(m["loss"])
    log(f"compile: {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = trainer.run_step(state, batches[i % len(batches)], rng)
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    ours = BATCH * STEPS / dt
    log(f"fused step: {dt / STEPS * 1e3:.2f} ms -> {ours:,.0f} ex/s")

    # ---- reference-structure baseline on the same chip ----
    model = trainer.model
    H = cfg.data.history_len
    S = cfg.data.group_size

    def naive_step(state, browsed_titles, cand_titles, browsed_mask, rng):
        drng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            def enc(t):
                return model.apply(
                    {"params": params}, t, deterministic=False,
                    rngs={"dropout": drng}, method="encode_news")
            # one encoder launch per news slot, as the reference loops
            cand_vecs = jnp.stack(
                [enc(cand_titles[:, j]) for j in range(S)], axis=1)
            browsed_vecs = jnp.stack(
                [enc(browsed_titles[:, j]) for j in range(H)], axis=1)
            user = model.apply({"params": params}, browsed_vecs, browsed_mask,
                               method="encode_user")
            scores = jnp.einsum("bd,bsd->bs", user, cand_vecs)
            return softmax_ce_loss(scores)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        return state.apply_gradients(grads=grads), loss

    naive_jit = jax.jit(naive_step, donate_argnums=(0,))
    title_tab = ds.news.title

    def host_assemble(b):
        # the reference re-gathers word ids per sample on host and ships
        # [B, H+S, 20] tensors every step
        bt = title_tab[b["browsed_ids"]]
        ct = title_tab[b["candidate_ids"]]
        bm = (b["browsed_ids"] != 0).astype(np.float32)
        return (jnp.asarray(bt), jnp.asarray(ct), jnp.asarray(bm))

    state2 = trainer.init_state(seed=0)
    t0 = time.perf_counter()
    bt, ct, bm = host_assemble(batches[0])
    state2, loss = naive_jit(state2, bt, ct, bm, rng)
    jax.block_until_ready(loss)
    log(f"naive compile: {time.perf_counter() - t0:.1f}s")

    naive_steps = max(10, STEPS // 3)
    t0 = time.perf_counter()
    for i in range(naive_steps):
        bt, ct, bm = host_assemble(batches[i % len(batches)])
        state2, loss = naive_jit(state2, bt, ct, bm, rng)
    jax.block_until_ready(loss)
    dt2 = time.perf_counter() - t0
    naive = BATCH * naive_steps / dt2
    log(f"naive step: {dt2 / naive_steps * 1e3:.2f} ms -> {naive:,.0f} ex/s")

    print(json.dumps({
        "metric": "nrms_train_examples_per_sec_per_chip",
        "value": round(ours, 1),
        "unit": "examples/sec/chip",
        "vs_baseline": round(ours / naive, 3),
    }))


if __name__ == "__main__":
    main()
