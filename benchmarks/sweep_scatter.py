"""Sweep word-embedding backward (scatter-add) strategies on hardware.

The train step's word-table backward is a scatter-add of ``[M*L, D]`` token
gradients into the ``[V, D]`` table (reference semantics: trainable
``nn.Embedding`` over GloVe, ``MIND_2020/model/nrms_v1.py:115-117``). XLA's
TPU scatter serializes on duplicate indices, making it ~24% of the whole
train step (benchmarks/profile_step.py: 8.9 ms of 36.5 ms at M=12288).

Variants measured here (marginal ms, chain-N-fetch-once method — see
bench.py docstring for why through the axon tunnel):

  xla_scatter    table.at[ids].add(dx)            — the baseline lowering
  segment_sum    jax.ops.segment_sum(num_segments=V) — alt lowering check
  sort_plan      HOST-precomputed sort plan: permutation gather -> sorted
                 cumsum-difference run reduction -> conflict-free scatter of
                 <=U unique rows (indices_are_sorted + unique_indices).
                 The plan (perm, run ends, unique ids) depends only on the
                 batch's token ids, so the input pipeline computes it off
                 the critical path (data/prefetch.py thread).
  sort_plan_seg  same plan but run reduction via sorted segment_sum
                 instead of cumsum-difference.

Run: python benchmarks/sweep_scatter.py [--m 12288] [--l 20] [--d 300]
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


def timeit(fn, *args, n_lo=5, n_hi=20, fetch=None):
    import jax
    f = fetch or (lambda o: np.asarray(jax.tree_util.tree_leaves(o)[0][:1]))
    out = fn(*args)
    f(out)
    times = {}
    for _ in range(3):
        for n in (n_lo, n_hi):
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(*args)
            f(out)
            dt = time.perf_counter() - t0
            times[n] = min(times.get(n, dt), dt)
    ms = (times[n_hi] - times[n_lo]) / (n_hi - n_lo) * 1e3
    if ms <= 0:
        ms = times[n_hi] / n_hi * 1e3
    return ms


def build_sort_plan(ids_flat: np.ndarray, n_unique_pad: int):
    """Host-side scatter plan: stable sort + run boundaries.

    Returns (perm [S], ends [U_pad], uniq [U_pad], n_runs). ``ends[i]`` is the
    (exclusive) end of sorted run i; padding runs repeat the last end so the
    cumsum-difference yields zero rows, and padding uniq ids point at row 0
    (the pinned pad row — also written by real run 0 whenever token 0 is
    present; order-independent since both contributions are summed by the
    conflict-free scatter... pad rows are zero so writing 0 is safe).
    """
    perm = np.argsort(ids_flat, kind="stable").astype(np.int32)
    sorted_ids = ids_flat[perm]
    boundaries = np.flatnonzero(np.diff(sorted_ids)) + 1
    starts = np.concatenate([[0], boundaries]).astype(np.int32)
    ends = np.concatenate([boundaries, [len(ids_flat)]]).astype(np.int32)
    uniq = sorted_ids[starts].astype(np.int32)
    n = len(uniq)
    assert n <= n_unique_pad, (n, n_unique_pad)
    ends_pad = np.full(n_unique_pad, len(ids_flat), np.int32)
    ends_pad[:n] = ends
    uniq_pad = np.zeros(n_unique_pad, np.int32)
    uniq_pad[:n] = uniq
    # make padded uniq ids strictly usable with unique_indices=True: padding
    # rows get distinct ids ONLY if their contribution is zero; cumsum-diff
    # gives exactly zero for repeated ends, so pointing them all at row 0 is
    # still a duplicate. Use a dedicated scratch row V (table padded by 1).
    return perm, ends_pad, uniq_pad, n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=12288)
    ap.add_argument("--l", type=int, default=20)
    ap.add_argument("--d", type=int, default=300)
    ap.add_argument("--vocab", type=int, default=45800)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.utils.compile_cache import enable
    enable()

    M, L, D, V = args.m, args.l, args.d, args.vocab
    S = M * L
    log(f"devices: {jax.devices()}  S={S} V={V} D={D}")

    rng = np.random.default_rng(0)
    # realistic token distribution: Zipfian word frequencies + pad zeros
    zipf = rng.zipf(1.3, size=S).astype(np.int64)
    ids_np = np.minimum(zipf, V - 1).astype(np.int32)
    ids_np[rng.random(S) < 0.25] = 0  # pad tokens
    n_uniq = len(np.unique(ids_np))
    log(f"unique tokens: {n_uniq}")

    key = jax.random.PRNGKey(0)
    dx = jax.random.normal(key, (S, D), jnp.float32)
    dx_bf = dx.astype(jnp.bfloat16)
    ids = jnp.asarray(ids_np)

    # ---- baseline: XLA scatter-add ----
    @jax.jit
    def xla_scatter(dx, ids):
        return jnp.zeros((V, D), jnp.float32).at[ids].add(dx)

    ms = timeit(xla_scatter, dx, ids, fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"xla_scatter (f32 dx):      {ms:8.2f} ms")
    ref = np.asarray(xla_scatter(dx, ids))

    @jax.jit
    def xla_scatter_bf(dxb, ids):
        return jnp.zeros((V, D), jnp.float32).at[ids].add(
            dxb.astype(jnp.float32))

    ms = timeit(xla_scatter_bf, dx_bf, ids, fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"xla_scatter (bf16 dx):     {ms:8.2f} ms")

    # ---- segment_sum lowering ----
    @jax.jit
    def seg_sum(dx, ids):
        return jax.ops.segment_sum(dx, ids, num_segments=V)

    ms = timeit(seg_sum, dx, ids, fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"segment_sum:               {ms:8.2f} ms")

    # ---- host sort plan ----
    U_pad = 1 << int(np.ceil(np.log2(max(n_uniq, 1))))
    t0 = time.perf_counter()
    perm_np, ends_np, uniq_np, n_runs = build_sort_plan(ids_np, U_pad)
    host_ms = (time.perf_counter() - t0) * 1e3
    log(f"host plan build: {host_ms:.2f} ms (U_pad={U_pad}, runs={n_runs})")

    perm = jnp.asarray(perm_np)
    ends = jnp.asarray(ends_np)
    uniq = jnp.asarray(uniq_np)

    @jax.jit
    def sort_plan(dx, perm, ends, uniq):
        dxs = jnp.take(dx, perm, axis=0)                    # [S, D] gather
        c = jnp.cumsum(dxs, axis=0, dtype=jnp.float32)      # run reduction
        c = jnp.concatenate([jnp.zeros((1, D), jnp.float32), c], axis=0)
        sums = jnp.take(c, ends, axis=0) - jnp.concatenate(
            [jnp.zeros((1, D), jnp.float32),
             jnp.take(c, ends[:-1], axis=0)], axis=0)       # [U_pad, D]
        # padding runs produce exact zeros (repeated ends) -> scatter to row 0
        out = jnp.zeros((V, D), jnp.float32)
        return out.at[uniq].add(sums, indices_are_sorted=True)

    ms = timeit(sort_plan, dx, perm, ends, uniq,
                fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"sort_plan (cumsum-diff):   {ms:8.2f} ms")
    got = np.asarray(sort_plan(dx, perm, ends, uniq))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    log(f"  rel err vs baseline: {err:.2e}")

    # ---- sort plan + sorted segment ids ----
    seg_ids_np = np.zeros(S, np.int32)
    starts = np.concatenate([[0], np.flatnonzero(np.diff(ids_np[perm_np])) + 1])
    seg_ids_np[starts] = 1
    seg_ids_np[0] = 0
    seg_ids_np = np.cumsum(seg_ids_np).astype(np.int32)
    seg_ids = jnp.asarray(seg_ids_np)

    @jax.jit
    def sort_plan_seg(dx, perm, seg_ids, uniq):
        dxs = jnp.take(dx, perm, axis=0)
        sums = jax.ops.segment_sum(dxs, seg_ids, num_segments=U_pad,
                                   indices_are_sorted=True)
        return jnp.zeros((V, D), jnp.float32).at[uniq].add(
            sums, indices_are_sorted=True)

    ms = timeit(sort_plan_seg, dx, perm, seg_ids, uniq,
                fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"sort_plan (segment_sum):   {ms:8.2f} ms")
    got = np.asarray(sort_plan_seg(dx, perm, seg_ids, uniq))
    err = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-9)
    log(f"  rel err vs baseline: {err:.2e}")

    # ---- components of sort_plan, to see where time goes ----
    @jax.jit
    def just_gather(dx, perm):
        return jnp.take(dx, perm, axis=0)

    ms = timeit(just_gather, dx, perm, fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"  gather [S,D] by perm:    {ms:8.2f} ms")

    @jax.jit
    def just_cumsum(dx):
        return jnp.cumsum(dx, axis=0, dtype=jnp.float32)

    ms = timeit(just_cumsum, dx, fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"  cumsum [S,D]:            {ms:8.2f} ms")

    @jax.jit
    def just_unique_scatter(sums, uniq):
        return jnp.zeros((V, D), jnp.float32).at[uniq].add(
            sums, indices_are_sorted=True)

    sums0 = jnp.ones((U_pad, D), jnp.float32)
    ms = timeit(just_unique_scatter, sums0, uniq,
                fetch=lambda o: np.asarray(o[:1, :1]))
    log(f"  scatter U_pad={U_pad} rows:  {ms:8.2f} ms")


if __name__ == "__main__":
    main()
