#!/usr/bin/env python
"""Batch-decode Q4 kernel lab — the n > 8 grouped-integer campaign (r5).

VERDICT r4 weak #1: B=1 decode runs at the measured DMA ceiling (530-690
GB/s) but batch decode (B=64/128 serving steps) runs at 189-286 GB/s on
weights, because ops/pallas_q4.py falls back to per-element f32x dequant
for n > 8 (the block-diagonal gi trick costs G x MXU flops — a non-starter
at batch where the MXU is already ~half the step budget).

Per-element op budget (v5e, kernel_lab findings baked in: unpack must run
in i32; bf16 ALU is NOT 2x f32; u16 narrowing relayouts):

  f32x (production fallback): and/shift, or-magic, bitcast, sub, mul,
       cast-bf16  ~= 5 ops/elem -> ~29G VPU ops on GPT-J weights ~ 7.5 ms,
       sitting ON TOP of the 5.7 ms DMA floor at B=64.
  bsub: and/shift, i32 sub 8, convert->bf16, mul bf16-scales
       ~= 4 ops/elem, no correction needed.
  bnos: and/shift, convert->bf16, mul ~= 3 ops/elem; the offset-8 folds
       into the kernel's OUTPUT INIT, computed outside by XLA:
       init = -8 * (xs @ s_all), xs[n,r] = sum of x group r (exact in f32;
       costs one tiny einsum + a re-read of the scales = +12.5% HBM).

Geometries:
  2d   — the production [256 kh, 2048 o] wide-o grid (x resident)
  band — whole-O row bands, pure k grid, OUTPUT RESIDENT in VMEM
         (kernel_lab: contiguous whole-O tiles ~900 GB/s vs ~620 strided);
         needs a raised scoped-VMEM limit at batch ([N, O] f32 out)

`dma` rows give the DMA-only ceiling per geometry for the same tiling.

Usage: python tools/batch_lab.py [--batch 64] [--shapes gptj]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsim_tpu.quant.q4 import QK, Q4Tensor, to_plane_split


def _expand(s, tkh):
    nb, to = s.shape
    return jnp.broadcast_to(s[:, None, :], (nb, tkh // nb, to)).reshape(
        tkh, to)


# ---------------------------------------------------------------------------
# 2D wide-o grid kernels (ps layout, x resident, k-grid arbitrary)
# ---------------------------------------------------------------------------


def _k2d_f32x(x_ref, p_ref, s_ref, o_ref, *, block_kh, half_k):
    """Production batch fallback math (f32x, bf16 planes) — the baseline."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    nb = block_kh // QK
    nb2 = half_k // QK
    sexp_lo = _expand(s_ref[pl.ds(k_step * nb, nb), :].astype(jnp.float32),
                      block_kh)
    sexp_hi = _expand(
        s_ref[pl.ds(nb2 + k_step * nb, nb), :].astype(jnp.float32), block_kh)
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
    wlo = ((lo - off) * sexp_lo).astype(jnp.bfloat16)
    whi = ((hi - off) * sexp_hi).astype(jnp.bfloat16)
    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    acc = jnp.dot(xlo, wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi, whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k2d_bsub(x_ref, p_ref, s_ref, o_ref, *, block_kh, half_k):
    """Integer-domain offset: (nibble - 8) exact in i32, convert to bf16
    (exact: |v| <= 8), multiply by bf16 scales — 2 fewer per-element ops
    than f32x and no f32 temporaries."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    nb = block_kh // QK
    nb2 = half_k // QK
    sexp_lo = _expand(s_ref[pl.ds(k_step * nb, nb), :], block_kh)
    sexp_hi = _expand(s_ref[pl.ds(nb2 + k_step * nb, nb), :], block_kh)
    wlo = ((p & 0x0F) - 8).astype(jnp.bfloat16) * sexp_lo
    whi = ((p >> 4) - 8).astype(jnp.bfloat16) * sexp_hi
    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    acc = jnp.dot(xlo, wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi, whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k2d_bnos(x_ref, p_ref, s_ref, c_ref, o_ref, *, block_kh, half_k):
    """No in-kernel offset at all: raw nibbles (0..15, exact in bf16) times
    bf16 scales; the -8 correction arrives pre-computed as the output init
    (c_ref = bias - 8 * xs @ s_all, an XLA einsum outside)."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = c_ref[:]

    p = p_ref[:].astype(jnp.int32)
    nb = block_kh // QK
    nb2 = half_k // QK
    sexp_lo = _expand(s_ref[pl.ds(k_step * nb, nb), :], block_kh)
    sexp_hi = _expand(s_ref[pl.ds(nb2 + k_step * nb, nb), :], block_kh)
    wlo = (p & 0x0F).astype(jnp.bfloat16) * sexp_lo
    whi = (p >> 4).astype(jnp.bfloat16) * sexp_hi
    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    acc = jnp.dot(xlo, wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi, whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k2d_dma(x_ref, p_ref, s_ref, o_ref, *, block_kh, half_k):
    """DMA ceiling for this tiling: touch the tile minimally."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    r = min(8, p_ref.shape[0])
    o_ref[0:r, :] += (p_ref[0:r, :].astype(jnp.int32).astype(jnp.float32)
                      + s_ref[0:r, :].astype(jnp.float32)
                      + x_ref[0:r, 0:1].astype(jnp.float32))


def run_2d(x, packed, scales, corr, *, variant, block_o, block_kh):
    N, K = x.shape
    half_k = K // 2
    O = packed.shape[1]
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))
    kern = {"f32x": _k2d_f32x, "bsub": _k2d_bsub, "bnos": _k2d_bnos,
            "dma": _k2d_dma}[variant]
    in_specs = [
        pl.BlockSpec((N, K), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_kh, block_o), lambda i, k: (k, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((scales.shape[0], block_o), lambda i, k: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    args = [x, packed, scales]
    if variant == "bnos":
        in_specs.append(pl.BlockSpec((N, block_o), lambda i, k: (0, i),
                                     memory_space=pltpu.VMEM))
        args.append(corr)
    return pl.pallas_call(
        functools.partial(kern, block_kh=block_kh, half_k=half_k),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N, block_o), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(*args)


# ---------------------------------------------------------------------------
# Row-band kernels (whole-O contiguous DMA, output resident, pure k grid)
# ---------------------------------------------------------------------------


def _kband(x_ref, p_ref, slo_ref, shi_ref, c_ref, o_ref, *,
           block_kh, half_k, ochunk, math):
    k_step = pl.program_id(0)

    @pl.when(k_step == 0)
    def _():
        if math == "bnos":
            o_ref[:] = c_ref[:]
        else:
            o_ref[:] = jnp.zeros_like(o_ref)

    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    O = p_ref.shape[1]  # noqa: N806
    for j in range(O // ochunk):
        p = p_ref[:, pl.ds(j * ochunk, ochunk)].astype(jnp.int32)
        if math == "dma":
            r = 8
            o_ref[0:r, pl.ds(j * ochunk, ochunk)] += (
                p[0:r].astype(jnp.float32)
                + slo_ref[0:r, pl.ds(j * ochunk, ochunk)].astype(jnp.float32)
                + xlo[0:r, 0:1].astype(jnp.float32))
            continue
        slo = _expand(slo_ref[:, pl.ds(j * ochunk, ochunk)], block_kh)
        shi = _expand(shi_ref[:, pl.ds(j * ochunk, ochunk)], block_kh)
        if math == "bsub":
            wlo = ((p & 0x0F) - 8).astype(jnp.bfloat16) * slo
            whi = ((p >> 4) - 8).astype(jnp.bfloat16) * shi
        elif math == "bnos":
            wlo = (p & 0x0F).astype(jnp.bfloat16) * slo
            whi = (p >> 4).astype(jnp.bfloat16) * shi
        else:  # f32x
            magic = jnp.int32(0x4B000000)
            off = jnp.float32(8388608.0 + 8.0)
            lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic,
                                              jnp.float32)
            hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
            wlo = ((lo - off) * slo.astype(jnp.float32)).astype(jnp.bfloat16)
            whi = ((hi - off) * shi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = jnp.dot(xlo, wlo, preferred_element_type=jnp.float32)
        acc += jnp.dot(xhi, whi, preferred_element_type=jnp.float32)
        o_ref[:, pl.ds(j * ochunk, ochunk)] += acc


def run_band(x, packed, scales, corr, *, math, block_kh, ochunk, vmem_mb):
    N, K = x.shape
    half_k = K // 2
    O = packed.shape[1]
    G = block_kh // QK
    nb2 = half_k // QK
    grid = (half_k // block_kh,)
    in_specs = [
        pl.BlockSpec((N, K), lambda k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_kh, O), lambda k: (k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, O), lambda k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, O), lambda k, nb2=nb2, G=G: (nb2 // G + k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((N, O), lambda k: (0, 0), memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        functools.partial(_kband, block_kh=block_kh, half_k=half_k,
                          ochunk=min(ochunk, O), math=math),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N, O), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_mb << 20),
    )(x, packed, scales, scales, corr)


# ---------------------------------------------------------------------------
# harness
# ---------------------------------------------------------------------------


def make_fn(variant, w, N, K, O, block_kh, ochunk, vmem_mb):
    """Returns f(x) -> y including any external correction ops (so the
    measurement charges bnos for its einsum + scales re-read)."""
    geom, math = variant.split("/")
    s_f32 = w.scales.astype(jnp.float32)

    def corr_of(x):
        if math != "bnos":
            return jnp.zeros((N, O), jnp.float32)
        xs = x.astype(jnp.float32).reshape(N, K // QK, QK).sum(-1)
        return -8.0 * jnp.einsum("nr,ro->no", xs, s_f32,
                                 preferred_element_type=jnp.float32)

    if geom == "2d":
        def fn(x):
            return run_2d(x, w.packed, w.scales, corr_of(x), variant=math,
                          block_o=min(2048, O), block_kh=block_kh)
    else:
        def fn(x):
            return run_band(x, w.packed, w.scales, corr_of(x), math=math,
                            block_kh=block_kh, ochunk=ochunk,
                            vmem_mb=vmem_mb)
    return fn


def bench(O, K, batch, fn, iters=24, reps_in_step=8):
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((batch, K)), jnp.bfloat16)

    @jax.jit
    def step(x):
        for _ in range(reps_in_step):
            y = fn(x)
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
    per = (t_long - t_short) / (iters - 4) / reps_in_step
    wbytes = O * K // 2 + O * K // QK * 2
    return per * 1e3, wbytes / per / 1e9


def check(variant, block_kh=256, ochunk=2048, N=16):
    from vsim_tpu.quant.q4 import dequantize_km

    rng = np.random.default_rng(1)
    O = K = 1024
    w = to_plane_split(jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32))))
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
    ref = x.astype(jnp.float32) @ dequantize_km(w, jnp.float32)
    fn = make_fn(variant, w, N, K, O, min(block_kh, K // 2),
                 min(ochunk, O), 64)
    got = fn(x)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    return float(jnp.max(jnp.abs(got - ref))) / scale


SHAPES = {
    "gptj": [(12288, 4096), (4096, 4096), (16384, 4096), (4096, 16384)],
    "pythia12b": [(15360, 5120), (5120, 5120), (20480, 5120),
                  (5120, 20480)],
    "one": [(4096, 16384)],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--shapes", default="gptj", choices=sorted(SHAPES))
    ap.add_argument("--variants", default=(
        "2d/dma,2d/f32x,2d/bsub,2d/bnos,band/dma,band/f32x,band/bsub,"
        "band/bnos"))
    ap.add_argument("--block-kh", type=int, default=256)
    ap.add_argument("--ochunk", type=int, default=2048)
    ap.add_argument("--vmem-mb", type=int, default=96)
    ap.add_argument("--check", action="store_true",
                    help="numerics only (vs f32 XLA oracle)")
    args = ap.parse_args()

    variants = args.variants.split(",")
    if args.check:
        for v in variants:
            if v.endswith("dma"):
                continue
            print(f"{v:10s} relerr {check(v):.2e}")
        return 0

    rng = np.random.default_rng(0)
    out = {"batch": args.batch, "rows": []}
    for O, K in SHAPES[args.shapes]:
        w = to_plane_split(jax.device_put(Q4Tensor.from_dense_np(
            rng.standard_normal((O, K)).astype(np.float32))))
        for v in variants:
            try:
                fn = make_fn(v, w, args.batch, K, O, args.block_kh,
                             args.ochunk, args.vmem_mb)
                ms, gbs = bench(O, K, args.batch, fn)
                row = {"shape": [O, K], "variant": v,
                       "ms": round(ms, 4), "gbs": round(gbs, 1)}
            except Exception as e:  # Mosaic rejections are data too
                row = {"shape": [O, K], "variant": v,
                       "error": str(e).split("\n")[0][:160]}
            out["rows"].append(row)
            print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
