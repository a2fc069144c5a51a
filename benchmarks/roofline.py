"""Speed-of-light (roofline) accounting for the NRMS hot path.

The north-star target asks for per-chip kernels measured against
speed-of-light (BASELINE.json). This harness computes analytic FLOP and HBM
byte counts for each hot component at bench dimensions (batch 512, dedup
width ~12288, L=20, D=300, H=10 — reference ``MIND_2020/config.py``), times
them on the attached chip with the chain-N method (see bench.py), and
reports achieved TFLOP/s / GB/s against the chip's peaks plus the light
bound ``max(flops/peak_flops, bytes/peak_bw)``.

Interpretation notes (also in docs/DESIGN.md):
 - The encoder is a compute roofline with heavy *padding tax*: D=300 pads to
   384 lanes, dh=30 pads to 128 in every per-head attention dot (4.27x).
   "% of light" is computed against USEFUL flops, so the padding tax shows
   up as lost efficiency — that is the honest number.
 - The embedding gather/scatter light bound assumes streaming HBM; the real
   limiter is row-indexed access granularity (~90 GB/s effective on v5e for
   1.2 KB rows). Both numbers are printed. bf16 payloads and presorted ids
   were measured and do NOT move it (fixed per-row cost, not bytes).

Run: python benchmarks/roofline.py [--batch 512]
``--batch`` scales the dedup width M (and with it every T = M*L count)
proportionally from the measured batch-512 value of ~12288 unique news.
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

from benchmarks.profile_step import timeit, log  # noqa: E402

# device_kind substring -> (bf16 TFLOP/s, HBM GB/s)
PEAKS = {
    "v5 lite": (197.0, 819.0),   # v5e
    "v5e": (197.0, 819.0),
    "v5p": (459.0, 2765.0),
    "v5": (197.0, 819.0),
    "v4": (275.0, 1228.0),
    "v6": (918.0, 1640.0),
    "v3": (123.0, 900.0),
}


def chip_peaks(kind: str):
    k = kind.lower()
    for sub, p in PEAKS.items():
        if sub in k:
            return p
    return None


def fmt_row(name, ms, gflop, gbytes, peaks, gflop_padded=None):
    tf = gflop / ms  # GFLOP / ms == TFLOP/s
    gbs = gbytes / ms * 1e3
    if peaks:
        pf, pb = peaks
        light_ms = max(gflop / pf, gbytes / pb * 1e3)  # GB/(GB/s)*1e3 = ms
        pct = 100.0 * light_ms / ms
        bound = "compute" if gflop / pf >= gbytes / pb * 1e3 else "memory"
        extra = (f"  light {light_ms:6.2f} ms ({bound}-bound)"
                 f"  -> {pct:5.1f}% of light")
        if gflop_padded is not None:
            # hardware-inclusive bound: the MXU must process the PADDED
            # operand tiles (lane/contraction quantization to 128), so this
            # is the fastest any schedule of THIS kernel's matmuls could go
            pad_ms = max(gflop_padded / pf, gbytes / pb * 1e3)
            extra += (f"  | padded-MXU light {pad_ms:5.2f} ms "
                      f"-> {100.0 * pad_ms / ms:5.1f}%")
    else:
        extra = ""
    log(f"{name:<34} {ms:8.2f} ms  {tf:7.1f} TF/s  {gbs:7.0f} GB/s{extra}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--embed-dim", type=int, default=300,
                    help="word embed dim D (384 = MXU-aligned geometry, "
                         "benchmarks/padding_tax.py)")
    ap.add_argument("--heads", type=int, default=10,
                    help="attention heads H (dh = D/H; 3 at D=384 gives "
                         "lane-exact dh=128)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from pytorch_news_recommender_tpu.utils.compile_cache import enable
    enable()
    from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
        fused_news_encoder, fused_news_encoder_diff,
    )

    kind = jax.devices()[0].device_kind
    peaks = chip_peaks(kind)
    log(f"device: {kind}  peaks: {peaks and f'{peaks[0]} bf16 TFLOP/s, {peaks[1]} GB/s HBM'}")

    B = args.batch
    # representative dedup width at batch 512 (u~8.3k lands on the 9216
    # rung of the round-5 ladder; 12288 kept here for cross-round
    # comparability of the absolute ms — the %-of-light numbers are
    # per-row and M-independent); scale proportionally (rounded up to the
    # kernel's 256-row grid block)
    M = -(-12288 * B // 512) // 256 * 256 or 256
    L, D, Q, H = 20, args.embed_dim, 200, args.heads
    assert D % H == 0, (D, H)
    T = M * L
    V = 45800

    key = jax.random.PRNGKey(1)
    x = jax.random.normal(key, (M, L, D), jnp.bfloat16)
    mask = jnp.ones((M, L), jnp.float32)
    p = {n: jax.random.normal(jax.random.fold_in(key, i), s, jnp.bfloat16)
         for i, (n, s) in enumerate({
             "wqkv": (D, 3 * D), "bqkv": (3 * D,), "wo": (D, D),
             "bo": (D,), "aw": (D, Q), "ab": (Q,), "aq": (Q,)}.items())}

    # ---- analytic counts (useful work only, no padding tax) ----
    dh = D // H
    enc_flops = (
        2 * T * D * 3 * D            # QKV projection
        + H * M * 2 * L * L * dh * 2  # scores + PV
        + 2 * T * D * D              # output projection
        + 2 * T * D * Q + 2 * M * L * Q  # additive attention
    ) / 1e9  # GFLOP
    # activations in/out + params once (weights stream from HBM per grid pass)
    enc_bytes = (T * D * 2 * 2 + (3 * D * D + D * D + D * Q) * 2) / 1e9  # GB

    # ---- PADDED-MXU counts: the flops the systolic array actually has to
    # process for THIS kernel's matmul schedule, with every contraction and
    # output-lane dim quantized to the 128-wide tile (sublane/batch dims
    # stream). Includes the implementation's segment-indicator pooling
    # matmuls and the pairwise-mask dot, which the useful count excludes.
    # The ratio padded/useful IS the geometry's padding tax; the residual
    # above the padded bound is VPU work (softmax/exp/mask/dropout) +
    # scratch staging, which geometry does not change.
    from pytorch_news_recommender_tpu.ops.pallas.fused_encoder import (
        _block_geometry,
    )
    pad = lambda v: -(-v // 128) * 128
    BM, P, SUB = _block_geometry(L)
    R = BM * L
    # counts built from the PADDED news count (ceil to whole grid blocks) —
    # that is what the array actually processes when M % BM != 0
    M_pad = -(-M // BM) * BM
    T_pad = M_pad * L
    nsub_tot = T_pad // SUB           # subtiles across the whole batch
    grid = M_pad // BM
    enc_flops_padded = (
        2 * T_pad * pad(D) * pad(3 * D)                 # QKV
        + H * nsub_tot * 2 * SUB * pad(dh) * pad(SUB)   # scores (qk^T)
        + H * nsub_tot * 2 * SUB * pad(SUB) * pad(dh)   # PV
        + nsub_tot * 2 * SUB * 128 * pad(SUB)           # pairwise mask m@m^T
        + 2 * T_pad * pad(D) * pad(D)                   # output projection
        + 2 * T_pad * pad(D) * pad(Q)                   # additive aw
        + 2 * T_pad * pad(Q) * 128                      # additive aq
        + grid * (2 * BM * pad(R) * pad(D)       # pooling num [BM,R]@[R,D]
                  + 2 * BM * pad(R) * 128)       # pooling den [BM,R]@[R,1]
    ) / 1e9

    @jax.jit
    def enc_fwd(x, mask):
        return fused_news_encoder(
            x, mask, p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["aw"],
            p["ab"], p["aq"], num_heads=H, dropout_rate=0.0)
    ms, _ = timeit(enc_fwd, x, mask, fetch=lambda o: np.asarray(o[:1, :1]))
    fmt_row(f"fused encoder fwd (M={M})", ms, enc_flops, enc_bytes, peaks,
            gflop_padded=enc_flops_padded)
    log(f"  padding tax (padded/useful MXU flops): "
        f"{enc_flops_padded / enc_flops:.2f}x at D={D}/H={H} "
        f"(geometry: BM={BM} P={P} SUB={SUB})")

    @jax.jit
    def enc_grad(x, mask):
        def loss(x):
            return jnp.sum(fused_news_encoder_diff(
                x, mask, p["wqkv"], p["bqkv"], p["wo"], p["bo"], p["aw"],
                p["ab"], p["aq"], num_heads=H,
                dropout_rate=0.2, seed=7).astype(jnp.float32))
        return jax.grad(loss)(x)
    ms, _ = timeit(enc_grad, x, mask, fetch=lambda o: np.asarray(o[:1, :1, :1]))
    # bwd ~= 2x fwd flops (dx and dw matmuls) + fwd recompute of o1 chain;
    # the same 3x scaling applies to the padded schedule
    fmt_row("fused encoder fwd+bwd", ms, 3 * enc_flops, 3 * enc_bytes, peaks,
            gflop_padded=3 * enc_flops_padded)

    # ---- embedding gather + scatter ----
    table = jax.random.normal(key, (V, D), jnp.float32)
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, V, size=(M, L)), jnp.int32)

    @jax.jit
    def emb_grad(table, ids):
        def loss(t):
            e = jnp.take(t, ids, axis=0).astype(jnp.bfloat16)
            return jnp.sum(e.astype(jnp.float32) ** 2)
        return jax.grad(loss)(table)
    ms, _ = timeit(emb_grad, table, ids, fetch=lambda o: np.asarray(o[:1, :1]))
    # gather read T rows f32 + write bf16; scatter: sort(key+payload) ~2
    # passes + table write. Streaming assumption — see module docstring.
    emb_bytes = (T * D * 4 + T * D * 2        # gather
                 + 3 * T * D * 4 + V * D * 4  # sort+reduce+scatter, table
                 ) / 1e9
    fmt_row("embedding gather+scatter", ms, 2 * T * D / 1e9, emb_bytes, peaks)
    eff = T * D * 4 / 1e9 / ms * 1e3  # one 1.2KB-row pass / chain time
    log(f"  per-row-pass effective bandwidth across the chain: {eff:.0f} GB/s"
        f" (fixed per-row cost — bf16 payload and presorted ids measure flat)")

    log("")
    log("Interpretation: the encoder's gap to light is the padding tax")
    log("(D=300->384 lanes, dh=30->128 per-head dots) plus VPU softmax/mask")
    log("work that the roofline's matmul-only FLOP count excludes; the")
    log("embedding path is row-granularity bound, not stream-bandwidth bound.")


if __name__ == "__main__":
    main()
