#!/usr/bin/env python
"""Pair-construction dequant experiments for the Q4 kernel.

The production kernel (ops/pallas_q4.py) is VPU-dequant-bound: tools/
kernel_lab.py measures the i32 unpack chain at ~550 GB/s on the big
50432x4096 shape while a minimal-compute DMA kernel hits ~1150 GB/s.

Variants here attack the per-element op count:

  f32b   — f32 mantissa-OR magic (0x4B000000 | v == 2^23+v) with the
           (2^23+8)*s offset pre-folded into a per-block BIAS tile, so the
           big-domain math is one multiply + one add (FMA-able) per plane.
  pairA  — build BOTH bf16 weights of a byte in one i32 lane
           (0x43004300 | lo | hi<<12; bf16 of 128+v has exponent 0x43,
           mantissa v<<3 exact for v in [0,15]) and pltpu.bitcast the
           [TKh, TO] i32 tile to a [2*TKh, TO] bf16 tile.  If the sublane
           unpack order is (low half -> row 2i, high -> 2i+1) this IS the
           natural K-major weight: ONE dot against natural x, no xe/xo
           deinterleave, no float converts, no bf16 trunc.
  pairB  — same with halves swapped (the other possible unpack order).

Run on real TPU: numerics are checked against the XLA dequant oracle first
(bitcast half-order is empirical), then timed at GPT-J lm-head scale.

Usage: python tools/pair_lab.py [--batch 32]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsim_tpu.quant.q4 import QK, Q4Tensor, dequantize_km


def _expand(s, rows, to):
    nb = s.shape[0]
    return jnp.broadcast_to(s[:, None, :], (nb, rows // nb, to)).reshape(rows, to)


# --- f32b: magic-OR + per-block bias (big-domain = or, and, mul, add) ------
def _k_f32b(x_ref, p_ref, s_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    magic = jnp.int32(0x4B000000)
    lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
    tkh, to = p.shape
    s = s_ref[:].astype(jnp.float32)
    sexp = _expand(s, tkh, to)
    bexp = _expand(s * jnp.float32(-(8388608.0 + 8.0)), tkh, to)
    wlo = (lo * sexp + bexp).astype(jnp.bfloat16)
    whi = (hi * sexp + bexp).astype(jnp.bfloat16)
    xe = x_ref[:, 0::2]
    xo = x_ref[:, 1::2]
    acc = jnp.dot(xe, wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo, whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _pair_kernel(x_ref, p_ref, s_ref, o_ref, *, hi_first):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    # bf16 of (128+v) for v in [0,15]: exp field 134 (0x4300), 7-bit
    # mantissa = v exactly.  Build BOTH halves' bf16 bits in one i32:
    # probe (2026-08-18): pltpu.bitcast i32->bf16 maps the LOW half to
    # row 2i and the HIGH half to row 2i+1 — exactly the byte's (lo, hi)
    # = (k even, k odd) element order, i.e. the natural K-major weight.
    if hi_first:  # the other order, in case the probe misled
        bits = ((p >> 4) & 0x0F) | ((p & 0x0F) << 16)
    else:
        bits = (p & 0x0F) | ((p & 0xF0) << 12)
    t = pltpu.bitcast(bits | jnp.int32(0x43004300), jnp.bfloat16)
    tkh, to = p.shape
    s = s_ref[:].astype(jnp.float32)
    sexp = _expand(s, 2 * tkh, to).astype(jnp.bfloat16)
    w = (t - jnp.bfloat16(136.0)) * sexp  # (128+v) - 136 = v - 8
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    o_ref[:] += acc


KERNELS = {
    "f32b": _k_f32b,
    "pairA": functools.partial(_pair_kernel, hi_first=False),
    "pairB": functools.partial(_pair_kernel, hi_first=True),
}


@functools.partial(jax.jit, static_argnames=("variant", "block_o", "block_kh"))
def variant_matmul(x, packed, scales, *, variant, block_o, block_kh):
    N, K = x.shape
    O = packed.shape[1]
    half_k = K // 2
    nb_per_tile = block_kh // (QK // 2)
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))
    return pl.pallas_call(
        KERNELS[variant],
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, 2 * block_kh), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, block_o), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_per_tile, block_o), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, block_o), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(x, packed, scales)


def check_numerics(variant, block_o=512, block_kh=2048):
    rng = np.random.default_rng(1)
    O, K = 1024, 4096
    wd = rng.standard_normal((O, K)).astype(np.float32)
    w = jax.device_put(Q4Tensor.from_dense_np(wd))
    x = jnp.asarray(rng.standard_normal((32, K)), jnp.bfloat16)
    ref = jnp.einsum("nk,ko->no", x.astype(jnp.float32),
                     dequantize_km(w, dtype=jnp.float32))
    got = variant_matmul(x, w.packed, w.scales, variant=variant,
                         block_o=min(block_o, O), block_kh=min(block_kh, K // 2))
    err = float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))
    return err


def bench(O, K, batch, variant, block_o, block_kh, iters=24, reps=8):
    rng = np.random.default_rng(0)
    w = jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32)))
    x0 = jnp.asarray(rng.standard_normal((batch, K)), jnp.bfloat16)

    @jax.jit
    def step(x):
        for _ in range(reps):
            y = variant_matmul(x, w.packed, w.scales, variant=variant,
                               block_o=block_o, block_kh=block_kh)
            x = x0 + (y[:, :1] * 1e-9).astype(jnp.bfloat16)
        return x

    x = step(x0)
    float(x.sum())

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        float(x.sum())
        return time.perf_counter() - t0

    run(4)
    t_short = min(run(4) for _ in range(2))
    t_long = min(run(iters) for _ in range(2))
    per_step = (t_long - t_short) / (iters - 4) / reps
    return per_step * 1e3, w.nbytes / per_step / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--big", action="store_true",
                    help="also time the 50432x4096 lm-head shape")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind} batch={args.batch}",
          flush=True)
    for v in ("f32b", "pairA", "pairB"):
        try:
            err = check_numerics(v)
        except Exception as e:
            print(f"{v:6s} FAILED: {type(e).__name__}: {str(e)[:300]}",
                  flush=True)
            continue
        line = f"{v:6s} relerr={err:.2e}"
        if err < 1e-2:
            ms, gbs = bench(50432, 4096, args.batch, v, 256, 2048)
            line += f"   lm 50432x4096: {ms:7.3f} ms  {gbs:6.1f} GB/s"
        print(line, flush=True)


if __name__ == "__main__":
    main()
