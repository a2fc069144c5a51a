"""Stage-by-stage ablation of the fused encoder kernel to locate the
dominant cost. Each variant keeps the same input pipeline and output shape.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, L, D, H, Q = 28672, 20, 300, 10, 200
BM = 64
R = BM * L
SUB = 160
P = 8


def timeit(name, fn, x, n=20):
    out = fn(x)
    _ = np.asarray(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(x)
    _ = np.asarray(out.ravel()[0])
    print(f"{name}: {(time.perf_counter()-t0)/n*1e3:7.2f} ms", flush=True)


def build(kernel, extra_scratch=()):
    def wrapped(x2, maskf, wqkv, bqkv, wo, bo, aw, ab, aq):
        grid = M // BM
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((R, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 3 * D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, Q), lambda i: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((Q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BM, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                scratch_shapes=list(extra_scratch),
            ),
            out_shape=jax.ShapeDtypeStruct((M, D), x2.dtype),
        )(x2, maskf, wqkv, bqkv, wo, bo, aw, ab, aq)
    return wrapped


# V0: pass-through reduction (just reads x, writes per-news row mean)
def k_passthrough(x_ref, maskf_ref, *refs):
    out_ref = refs[-1]
    x = x_ref[:]
    ind_r = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_c = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_r == ind_c).astype(x.dtype)
    out_ref[:] = jnp.dot(ind, x, preferred_element_type=jnp.float32).astype(out_ref.dtype)


# V1: + QKV projection (f32 scratch)
def k_qkv(x_ref, maskf_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, aw_ref,
          ab_ref, aq_ref, out_ref, qkv_scratch):
    x = x_ref[:]
    qkv_scratch[:] = (jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
                      + bqkv_ref[:])
    q = qkv_scratch[:, :D].astype(x.dtype)
    ind_r = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_c = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_r == ind_c).astype(x.dtype)
    out_ref[:] = jnp.dot(ind, q, preferred_element_type=jnp.float32).astype(out_ref.dtype)


# V2: + attention subtile loop (no tail)
def k_attn(x_ref, maskf_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, aw_ref,
           ab_ref, aq_ref, out_ref, qkv_scratch, o_scratch):
    x = x_ref[:]
    dh = D // H
    scale = 1.0 / dh ** 0.5
    nsub = R // SUB
    qkv_scratch[:] = (jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
                      + bqkv_ref[:])
    rows_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 0) // L
    cols_n = jax.lax.broadcasted_iota(jnp.int32, (SUB, SUB), 1) // L
    blockdiag = (rows_n == cols_n).astype(jnp.float32)

    def subtile(s, _):
        r0 = pl.multiple_of(s * SUB, 8)
        mvec = maskf_ref[pl.ds(r0, SUB), :]
        pair = jnp.dot(mvec, mvec.reshape(1, SUB),
                       preferred_element_type=jnp.float32) * blockdiag
        for h in range(H):
            qh = qkv_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh]
            kh = qkv_scratch[pl.ds(r0, SUB), D + h * dh:D + (h + 1) * dh]
            vh = qkv_scratch[pl.ds(r0, SUB), 2 * D + h * dh:2 * D + (h + 1) * dh]
            scores = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
            scores = jnp.where(pair > 0, scores * scale, -1e9)
            scores = scores - jnp.max(scores, axis=-1, keepdims=True)
            e = jnp.exp(scores)
            probs = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jnp.dot(probs, vh, preferred_element_type=jnp.float32)
            o_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh] = o
        return 0
    jax.lax.fori_loop(0, nsub, subtile, 0)
    o1 = o_scratch[:].astype(x.dtype)
    ind_r = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_c = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_r == ind_c).astype(x.dtype)
    out_ref[:] = jnp.dot(ind, o1, preferred_element_type=jnp.float32).astype(out_ref.dtype)


# V3: QKV + tail only (no attention loop; uses q as attention output)
def k_tail(x_ref, maskf_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref, aw_ref,
           ab_ref, aq_ref, out_ref, qkv_scratch):
    x = x_ref[:]
    qkv_scratch[:] = (jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
                      + bqkv_ref[:])
    o1 = qkv_scratch[:, :D].astype(x.dtype)
    o2 = jnp.dot(o1, wo_ref[:], preferred_element_type=jnp.float32) + bo_ref[:]
    t = jnp.tanh(jnp.dot(o2.astype(x.dtype), aw_ref[:],
                         preferred_element_type=jnp.float32) + ab_ref[:])
    s = jnp.dot(t, aq_ref[:], preferred_element_type=jnp.float32)
    s = jnp.where(maskf_ref[:] > 0, s, -1e9)
    s = s - jnp.max(s)
    e = jnp.where(maskf_ref[:] > 0, jnp.exp(s), 0.0)
    ind_r = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_c = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_r == ind_c).astype(jnp.float32)
    weights = ind * e.reshape(1, R)
    num = jnp.dot(weights, o2, preferred_element_type=jnp.float32)
    den = jnp.dot(ind, e, preferred_element_type=jnp.float32)
    out_ref[:] = (num / jnp.maximum(den, 1e-30)).astype(out_ref.dtype)


def main():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (M, L, D), jnp.bfloat16))(key)
    x2 = x.reshape(M * L, D)
    maskf = jnp.ones((M * L, 1), jnp.float32)
    p = [
        jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.bfloat16),
        jnp.zeros((1, 3 * D), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.bfloat16),
        jnp.zeros((1, D), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(D, Q)) * 0.05, jnp.bfloat16),
        jnp.zeros((1, Q), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(Q, 1)) * 0.1, jnp.bfloat16),
    ]
    f32 = jnp.float32
    timeit("V0 passthrough+pool  ", jax.jit(lambda x: build(k_passthrough)(x, maskf, *p)), x2)
    timeit("V1 +qkv projection   ", jax.jit(lambda x: build(
        k_qkv, [pltpu.VMEM((R, 3 * D), f32)])(x, maskf, *p)), x2)
    timeit("V2 +attention loop   ", jax.jit(lambda x: build(
        k_attn, [pltpu.VMEM((R, 3 * D), f32), pltpu.VMEM((R, D), f32)])(x, maskf, *p)), x2)
    timeit("V3 qkv+tail          ", jax.jit(lambda x: build(
        k_tail, [pltpu.VMEM((R, 3 * D), f32)])(x, maskf, *p)), x2)


if __name__ == "__main__":
    main()


# V2a: attention loop, slices only (copy qh into o_scratch, no math)
def k_attn_slices(x_ref, maskf_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                  aw_ref, ab_ref, aq_ref, out_ref, qkv_scratch, o_scratch):
    x = x_ref[:]
    dh = D // H
    nsub = R // SUB
    qkv_scratch[:] = (jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
                      + bqkv_ref[:])
    def subtile(s, _):
        r0 = pl.multiple_of(s * SUB, 8)
        for h in range(H):
            qh = qkv_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh]
            kh = qkv_scratch[pl.ds(r0, SUB), D + h * dh:D + (h + 1) * dh]
            vh = qkv_scratch[pl.ds(r0, SUB), 2 * D + h * dh:2 * D + (h + 1) * dh]
            o_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh] = qh + kh + vh
        return 0
    jax.lax.fori_loop(0, nsub, subtile, 0)
    o1 = o_scratch[:].astype(x.dtype)
    ind_r = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_c = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_r == ind_c).astype(x.dtype)
    out_ref[:] = jnp.dot(ind, o1, preferred_element_type=jnp.float32).astype(out_ref.dtype)


# V2b: slices + matmuls, softmax replaced by plain scale
def k_attn_nosoftmax(x_ref, maskf_ref, wqkv_ref, bqkv_ref, wo_ref, bo_ref,
                     aw_ref, ab_ref, aq_ref, out_ref, qkv_scratch, o_scratch):
    x = x_ref[:]
    dh = D // H
    scale = 1.0 / dh ** 0.5
    nsub = R // SUB
    qkv_scratch[:] = (jnp.dot(x, wqkv_ref[:], preferred_element_type=jnp.float32)
                      + bqkv_ref[:])
    def subtile(s, _):
        r0 = pl.multiple_of(s * SUB, 8)
        for h in range(H):
            qh = qkv_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh]
            kh = qkv_scratch[pl.ds(r0, SUB), D + h * dh:D + (h + 1) * dh]
            vh = qkv_scratch[pl.ds(r0, SUB), 2 * D + h * dh:2 * D + (h + 1) * dh]
            scores = jnp.dot(qh, kh.T, preferred_element_type=jnp.float32)
            probs = scores * scale
            o = jnp.dot(probs, vh, preferred_element_type=jnp.float32)
            o_scratch[pl.ds(r0, SUB), h * dh:(h + 1) * dh] = o
        return 0
    jax.lax.fori_loop(0, nsub, subtile, 0)
    o1 = o_scratch[:].astype(x.dtype)
    ind_r = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 0)
    ind_c = jax.lax.broadcasted_iota(jnp.int32, (BM, R), 1) // L
    ind = (ind_r == ind_c).astype(x.dtype)
    out_ref[:] = jnp.dot(ind, o1, preferred_element_type=jnp.float32).astype(out_ref.dtype)


def main2():
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    x = jax.jit(lambda k: jax.random.normal(k, (M, L, D), jnp.bfloat16))(key)
    x2 = x.reshape(M * L, D)
    maskf = jnp.ones((M * L, 1), jnp.float32)
    p = [
        jnp.asarray(rng.normal(size=(D, 3 * D)) * 0.05, jnp.bfloat16),
        jnp.zeros((1, 3 * D), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(D, D)) * 0.05, jnp.bfloat16),
        jnp.zeros((1, D), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(D, Q)) * 0.05, jnp.bfloat16),
        jnp.zeros((1, Q), jnp.bfloat16),
        jnp.asarray(rng.normal(size=(Q, 1)) * 0.1, jnp.bfloat16),
    ]
    f32 = jnp.float32
    timeit("V2a slices only      ", jax.jit(lambda x: build(
        k_attn_slices, [pltpu.VMEM((R, 3 * D), f32), pltpu.VMEM((R, D), f32)])(x, maskf, *p)), x2)
    timeit("V2b slices+matmuls   ", jax.jit(lambda x: build(
        k_attn_nosoftmax, [pltpu.VMEM((R, 3 * D), f32), pltpu.VMEM((R, D), f32)])(x, maskf, *p)), x2)
