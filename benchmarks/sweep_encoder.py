"""Geometry sweep for the fused encoder kernel on real TPU hardware.

Finds the (pack_news, block_news) sweet spot at MIND scale. Slope-method
timing (see .claude/skills/verify/SKILL.md).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
    _block_geometry,
    fused_news_encoder,
)

import argparse

_ap = argparse.ArgumentParser()
_ap.add_argument("--m", type=int, default=28672)
_ap.add_argument("--l", type=int, default=20)
_args = _ap.parse_args()
M, L, D, H, Q = _args.m, _args.l, 300, 10, 200


def main():
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
    for pack in (2, 4, 6, 8, 12):
        for bn in (32, 64, 128, 256):
            BM, P, SUB = _block_geometry(L, bn, pack)
            if (BM, P) not in [(c[2], c[3]) for c in combos]:
                combos.append((pack, bn, BM, P))

    for pack, bn, BM, P in combos:
        try:
            fn = jax.jit(lambda x, pack=pack, bn=bn: fused_news_encoder(
                x, mask, **p, num_heads=H, block_news=bn, pack_news=pack))
            out = fn(x)
            _ = np.asarray(out.ravel()[0])
            t0 = time.perf_counter()
            N = 20
            for _ in range(N):
                out = fn(x)
            _ = np.asarray(out.ravel()[0])
            dt = (time.perf_counter() - t0) / N * 1e3
            print(f"pack={pack:3d} block_news={bn:4d} (BM={BM}, SUB={P*L}):"
                  f" {dt:7.2f} ms", flush=True)
        except Exception as e:
            print(f"pack={pack} block_news={bn}: FAILED {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
