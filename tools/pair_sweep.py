#!/usr/bin/env python
"""Block-geometry sweep for the pairA dequant kernel (see pair_lab.py).

pairA builds BOTH bf16 weights of a packed byte in one i32 lane
(0x43004300 | lo | hi<<12) and pltpu.bitcast's the [TKh, TO] i32 tile to
[2*TKh, TO] bf16 — verified bit-exact on v5e (low half -> row 2i).

Variants:
  pairA  — (t - 136) * s on the bf16 tile, one dot.
  pairC  — t * s on the bf16 tile + correction dot: y -= 8 * (xsum_b @ s_b)
           where xsum_b = per-block sum of x (the -136 offset becomes
           -(128+8); the 128 folds with... no: (t-136)*s = t*s - 136*s, and
           sum_k x_k*136*s_b(k) = 136 * sum_b s_b * xsum_b — a [N, nb] @
           [nb, TO] dot 1/32 the FLOPs of the main dot).  Saves one bf16
           subtract per element on the big tile.
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


def _k_pairA(x_ref, p_ref, s_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    bits = (p & 0x0F) | ((p & 0xF0) << 12)
    t = pltpu.bitcast(bits | jnp.int32(0x43004300), jnp.bfloat16)
    tkh, to = p.shape
    s = s_ref[:].astype(jnp.float32)
    sexp = _expand(s, 2 * tkh, to).astype(jnp.bfloat16)
    w = (t - jnp.bfloat16(136.0)) * sexp
    o_ref[:] += jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)


def _k_pairC(x_ref, xs_ref, p_ref, s_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    bits = (p & 0x0F) | ((p & 0xF0) << 12)
    t = pltpu.bitcast(bits | jnp.int32(0x43004300), jnp.bfloat16)
    tkh, to = p.shape
    s = s_ref[:].astype(jnp.float32)
    sexp = _expand(s, 2 * tkh, to).astype(jnp.bfloat16)
    w = t * sexp
    acc = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)
    # correction: minus 136 * xsum_b @ s_b  ([N, nb] @ [nb, TO])
    corr = jnp.dot(xs_ref[:], s_ref[:].astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)
    o_ref[:] += acc - jnp.float32(136.0) * corr


@functools.partial(jax.jit, static_argnames=("variant", "block_o", "block_kh"))
def pair_matmul(x, xs, packed, scales, *, variant, block_o, block_kh):
    N, K = x.shape
    O = packed.shape[1]
    half_k = K // 2
    nb_per_tile = block_kh // (QK // 2)
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))
    if variant == "pairA":
        return pl.pallas_call(
            _k_pairA,
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
                dimension_semantics=("parallel", "arbitrary")),
        )(x, packed, scales)
    return pl.pallas_call(
        _k_pairC,
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, 2 * block_kh), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, nb_per_tile), lambda i, k: (0, k),
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
            dimension_semantics=("parallel", "arbitrary")),
    )(x, xs, packed, scales)


def block_sums(x):
    N, K = x.shape
    return x.reshape(N, K // QK, QK).sum(-1).astype(jnp.bfloat16)


def check(variant, bo, bkh):
    rng = np.random.default_rng(1)
    O, K = 1024, 4096
    wd = rng.standard_normal((O, K)).astype(np.float32)
    w = jax.device_put(Q4Tensor.from_dense_np(wd))
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    ref = jnp.einsum("nk,ko->no", x.astype(jnp.float32),
                     dequantize_km(w, dtype=jnp.float32))
    got = pair_matmul(x, block_sums(x), w.packed, w.scales, variant=variant,
                      block_o=min(bo, O), block_kh=min(bkh, K // 2))
    return float(jnp.max(jnp.abs(got - ref)) / (jnp.max(jnp.abs(ref)) + 1e-9))


def bench(O, K, batch, variant, bo, bkh, iters=24, reps=8):
    rng = np.random.default_rng(0)
    w = jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32)))
    x0 = jnp.asarray(rng.standard_normal((batch, K)), jnp.bfloat16)

    @jax.jit
    def step(x):
        for _ in range(reps):
            y = pair_matmul(x, block_sums(x), w.packed, w.scales,
                            variant=variant, block_o=bo, block_kh=bkh)
            x = x0 + (y[:, :1] * 1e-9).astype(jnp.bfloat16)
        return x

    x = step(x0); float(x.sum())

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
    per = (t_long - t_short) / (iters - 4) / reps
    return per * 1e3, w.nbytes / per / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--shape", default="50432,4096")
    ap.add_argument("--variants", default="pairA,pairC")
    args = ap.parse_args()
    O, K = (int(t) for t in args.shape.split(","))
    print(f"device={jax.devices()[0].device_kind} batch={args.batch} "
          f"shape={O}x{K}", flush=True)
    geoms = [(256, 2048), (512, 1024), (512, 2048), (1024, 512),
             (1024, 1024), (2048, 512), (2048, 1024), (4096, 512)]
    for v in args.variants.split(","):
        for (bo, bkh) in geoms:
            bo2, bkh2 = min(bo, O), min(bkh, K // 2)
            try:
                err = check(v, bo2, bkh2)
                ms, gbs = bench(O, K, args.batch, v, bo2, bkh2)
                print(f"{v:5s} bo={bo2:5d} bkh={bkh2:5d}  {ms:7.3f} ms "
                      f"{gbs:7.1f} GB/s  relerr={err:.2e}", flush=True)
            except Exception as e:
                print(f"{v:5s} bo={bo2:5d} bkh={bkh2:5d}  FAILED "
                      f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
