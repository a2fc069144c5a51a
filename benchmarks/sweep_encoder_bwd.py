"""Geometry sweep for the fused encoder kernel fwd+BWD on real TPU hardware.

The forward-only sweep (``sweep_encoder.py``) picked the current defaults;
the backward kernel has different VMEM pressure (8 scratches, replayed
forward), so its sweet spot may differ. Slope-method timing.

Run: python benchmarks/sweep_encoder_bwd.py [--d 300 --heads 10]
(--d 384 --heads 3 sweeps the MXU-preset geometry.)
"""

import pathlib
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
    _block_geometry,
    fused_news_encoder_diff,
)
from pytorch_news_recommender_tpu.utils.compile_cache import enable

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--m", type=int, default=12288)
_ap.add_argument("--l", type=int, default=20)
_ap.add_argument("--d", type=int, default=300)
_ap.add_argument("--heads", type=int, default=10)
_args = _ap.parse_args()
M, L, D, H, Q = _args.m, _args.l, _args.d, _args.heads, 200


def main():
    enable()
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (M, L, D), jnp.bfloat16))(key)
    mask = jnp.ones((M, L), jnp.float32)
    p = dict(
        wqkv=jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.bfloat16),
        bqkv=jnp.zeros((3 * D,), jnp.bfloat16),
        wo=jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.bfloat16),
        bo=jnp.zeros((D,), jnp.bfloat16),
        aw=jnp.asarray(rng.normal(size=(D, Q)) * 0.05, jnp.bfloat16),
        ab=jnp.zeros((Q,), jnp.bfloat16),
        aq=jnp.asarray(rng.normal(size=(Q,)) * 0.1, jnp.bfloat16),
    )

    combos = []
    for pack in (4, 6, 12):
        for bn in (32, 64, 128, 256):
            BM, P, SUB = _block_geometry(L, bn, pack)
            if (BM, P) not in [(c[2], c[3]) for c in combos]:
                combos.append((pack, bn, BM, P))

    for pack, bn, BM, P in combos:
        try:
            @jax.jit
            def grad_fn(x, pack=pack, bn=bn):
                def loss(x):
                    return jnp.sum(fused_news_encoder_diff(
                        x, mask, **p, num_heads=H, dropout_rate=0.2, seed=7,
                        block_news=bn, pack_news=pack).astype(jnp.float32))
                return jax.grad(loss)(x)

            out = grad_fn(x)
            _ = np.asarray(out[:1, :1, :1])
            times = []
            for _r in range(2):
                t0 = time.perf_counter()
                N = 15
                for _ in range(N):
                    out = grad_fn(x)
                _ = np.asarray(out[:1, :1, :1])
                times.append((time.perf_counter() - t0) / N * 1e3)
            dt = min(times)
            print(f"pack={pack:3d} block_news={bn:4d} (BM={BM}, SUB={P*L}):"
                  f" {dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"pack={pack} block_news={bn}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
