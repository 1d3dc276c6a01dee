#!/usr/bin/env python
"""Decode-step lab: where do GPT-J-6B B=1 decode milliseconds go, and does a
glue-free stacked kernel win?

bench.py --verbose phase attribution (2026-08-20, v5e) measured the stacked
Q4 matmuls at 170-370 GB/s effective while the SAME dequant math reaches
715 GB/s on the non-stacked lm-head shape (tools/kernel_lab.py).  Two
suspects:
  1. host-graph glue per call: reshape + x[:,0::2]/x[:,1::2] deinterleave +
     pad-to-8-rows concat + output slice, executed 28x per weight group per
     step (ops/pallas_q4.py:pallas_q4_matmul_stacked);
  2. tile geometry: _pick_blocks prefers tall [8192,128] tiles for big K at
     small n -> 128-byte strided DMA bursts + 8-step grids with no pipeline
     depth.

Variants, each timed as a scan-over-28-layers chain (the real decode shape):
  cur   — production pallas_q4_matmul_stacked (glue included)
  v2    — single-x-input kernel: deinterleave INSIDE the kernel (tiny x,
          VPU relayout), no row padding, geometry swept
Usage: python tools/decode_lab.py [--n 1] [--sweep]
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

from vsim_tpu.quant.q4 import QK, Q4Tensor
from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul_stacked

L = 28  # GPT-J-6B layer count
SHAPES = {  # group -> (K, O)
    "w_qkv": (4096, 12288),
    "wo": (4096, 4096),
    "w_fc": (4096, 16384),
    "w_proj": (16384, 4096),
}


def _expand(s, rows, to):
    nb = s.shape[0]
    return jnp.broadcast_to(s[:, None, :], (nb, rows // nb, to)).reshape(rows, to)


def _k_v2(il_ref, x_ref, p_ref, s_ref, o_ref, *, block_kh):
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xb = x_ref[:]  # [N, 2*bkh] natural K order
    N = xb.shape[0]
    xr = xb.reshape(N, block_kh, 2)
    xe = xr[:, :, 0]
    xo = xr[:, :, 1]

    p = p_ref[0].astype(jnp.int32)
    lo = (p & 0x0F) - 8
    hi = (p >> 4) - 8
    s = s_ref[0].astype(jnp.float32)
    tkh, to = p.shape
    sexp = _expand(s, tkh, to)
    wlo = (lo.astype(jnp.float32) * sexp).astype(jnp.bfloat16)
    whi = (hi.astype(jnp.float32) * sexp).astype(jnp.bfloat16)
    acc = jnp.dot(xe.astype(jnp.bfloat16), wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo.astype(jnp.bfloat16), whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("block_o", "block_kh"))
def v2_matmul(il, x, packed, scales, *, block_o, block_kh):
    N, K = x.shape
    O = packed.shape[-1]
    half_k = K // 2
    nb_per_tile = block_kh // (QK // 2)
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))
    return pl.pallas_call(
        functools.partial(_k_v2, block_kh=block_kh),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, 2 * block_kh), lambda i, k, il: (0, k)),
                pl.BlockSpec((1, block_kh, block_o),
                             lambda i, k, il: (il[0], k, i)),
                pl.BlockSpec((1, nb_per_tile, block_o),
                             lambda i, k, il: (il[0], k, i)),
            ],
            out_specs=pl.BlockSpec((N, block_o), lambda i, k, il: (0, i)),
        ),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(il, jnp.int32).reshape(1), x, packed, scales)


def stacked_weight(K, O, rng):
    packed = rng.integers(0, 256, size=(L, K // 2, O), dtype=np.uint8)
    scales = (rng.random((L, K // QK, O), dtype=np.float32) * 0.01).astype(
        jnp.bfloat16)
    return Q4Tensor(packed=jnp.asarray(packed), scales=jnp.asarray(scales))


def bench_chain(fn, x0, iters=12, reps=8):
    """Per-call time of fn: x -> y [N, O], chained (y feeds a tiny delta into
    the next x) so calls serialize on device.  NO lax.scan wrapper: scan +
    pallas + donation blows XLA compile time to 15+ min through the tunnel
    (measured 2026-08-20); a flat reps-chain compiles in ~2-4 min and the
    steady-state per-call time is the same quantity."""
    K = x0.shape[-1]

    @jax.jit
    def step(x):
        for i in range(reps):
            y = fn(x, i % L)
            x = x0 + (y[:, :1] * 1e-9).astype(jnp.bfloat16)
        return x

    x = step(x0)
    jax.block_until_ready(x)

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        jax.block_until_ready(x)
        return time.perf_counter() - t0

    run(2)
    t_short = min(run(2) for _ in range(2))
    t_long = min(run(iters) for _ in range(2))
    return (t_long - t_short) / (iters - 2) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1, help="decode rows (batch)")
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--variants", default="cur,v2")
    ap.add_argument("--groups", default="w_qkv,wo,w_fc,w_proj")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    n = args.n
    print(f"device={jax.devices()[0].device_kind} n={n}", flush=True)

    variants = args.variants.split(",")
    for g in args.groups.split(","):
        K, O = SHAPES[g]
        w = jax.device_put(stacked_weight(K, O, rng))
        gb_call = w.nbytes / L * 1e-9  # bytes one call streams (one layer)
        x0 = jnp.asarray(rng.standard_normal((n, K)), jnp.bfloat16)

        if "cur" in variants:
            t = bench_chain(
                lambda x, il, w=w: pallas_q4_matmul_stacked(x, w, il), x0)
            print(f"{g:7s} cur               {t*1e6:7.1f} us/call "
                  f"{gb_call/t:6.1f} GB/s", flush=True)

        if "flat" in variants:
            # non-stacked kernel on a single layer's weight: isolates the
            # scalar-prefetch stacked-indexing penalty (phase table shows
            # ~2-4 us/tile more for stacked vs the lm-head flat kernel)
            from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul

            w1 = Q4Tensor(packed=w.packed[0], scales=w.scales[0])
            t = bench_chain(
                lambda x, il, w1=w1: pallas_q4_matmul(
                    x, w1, acc_dtype=jnp.bfloat16), x0)
            print(f"{g:7s} flat              {t*1e6:7.1f} us/call "
                  f"{gb_call/t:6.1f} GB/s", flush=True)

        if "v2" not in variants:
            continue
        geoms = ([(512, 512), (1024, 512), (2048, 512), (1024, 1024),
                  (2048, 1024), (4096, 256)] if args.sweep
                 else [(2048, 512), (1024, 512)])
        for bo, bkh in geoms:
            bo2 = min(bo, O)
            bkh2 = min(bkh, K // 2)
            try:
                t = bench_chain(
                    lambda x, il, w=w, bo2=bo2, bkh2=bkh2: v2_matmul(
                        il, x, w.packed, w.scales, block_o=bo2,
                        block_kh=bkh2), x0)
                print(f"{g:7s} v2 bo={bo2:5d} kh={bkh2:4d} {t*1e6:7.1f} us/call"
                      f" {gb_call/t:6.1f} GB/s", flush=True)
            except Exception as e:
                print(f"{g:7s} v2 bo={bo2:5d} kh={bkh2:4d} FAILED "
                      f"{type(e).__name__}: {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
