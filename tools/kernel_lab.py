#!/usr/bin/env python
"""Q4 kernel variant lab — measures effective HBM GB/s per variant on the
real TPU to pick the production dequant strategy (ops/pallas_q4.py).

FINDINGS (v5e, 2026-08-18) — read before re-tuning:
  * The production kernel is VPU-dequant-bound, not DMA-bound: full-model
    GPT-J-6B decode step time is insensitive to tile geometry
    ((512,2048)/(1024,1024)/(2048,512)/(2048,256) all within 2%).
  * The 16-bit "exponent bitcast" dequant (uint16 | 0x4300 → bf16 − 136)
    is SLOWER end-to-end (17.8 ms vs 14.2 ms GPT-J step): the i32→u16
    narrowing is a cross-lane relayout, and bf16 VPU ALU ops are not 2x
    f32 on this core.  i32 unpack + sitofp + f32 mul (the production math)
    wins on the real model.
  * Microbench caveats baked in below: chain reps_in_step kernels per
    dispatch (launch ≈ 0.2 ms swamps sub-ms kernels) and make every
    variant consume the chained input (or XLA CSEs identical pure calls —
    the 'dma' ceiling variant once measured 1.4 TB/s that way).
  * Mosaic legalization gaps: no vector<i8> sub, no vector<i16> shift/and,
    no u8→f32 cast.  Unpack must run in i32.

Variants:
  dma      — minimal-compute tile touch: the DMA ceiling for this tiling
  cur      — production kernel (whatever ops/pallas_q4.py currently does)
  i32      — int32 unpack, f32 mul (the original kernel's math)
  u16      — 16-bit path: uint16 nibble | 0x4300, bitcast→bf16, -136, ×scale
  i8f      — int8 unpack → bf16 convert → ×scale

Each runs as a chained jit (output feeds next input) so steps serialize on
device; differencing two chain lengths cancels the axon tunnel RTT.

Usage: python tools/kernel_lab.py [--batch 16] [--sweep-blocks]
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


def _expand_scales(s, tkh, to):
    nb = s.shape[0]
    return jnp.broadcast_to(s[:, None, :], (nb, tkh // nb, to)).reshape(tkh, to)


def _k_dma(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # touch the tile cheaply: one few-row slice (keeps the HBM→VMEM copy
    # live); Mosaic has no uint8→float32 cast, widen via int32.  xe
    # participates so chained invocations depend on each other (defeats XLA
    # CSE).
    r = min(8, o_ref.shape[0])
    rs = min(8, s_ref.shape[0])
    o_ref[0:r, :] += (p_ref[0:r, :].astype(jnp.int32).astype(jnp.float32)
                      + s_ref[0:rs, :][0:r].astype(jnp.float32)
                      + xe_ref[0:r, 0:1].astype(jnp.float32))


def _k_i32(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    lo = (p & 0x0F) - 8
    hi = (p >> 4) - 8
    s = s_ref[:].astype(jnp.float32)
    tkh, to = p.shape
    sexp = _expand_scales(s, tkh, to)
    wlo = (lo.astype(jnp.float32) * sexp).astype(jnp.bfloat16)
    whi = (hi.astype(jnp.float32) * sexp).astype(jnp.bfloat16)
    acc = jnp.dot(xe_ref[:], wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k_u16(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    """Unpack in 32-bit (Mosaic legalizes no 16-bit shift/and), then narrow
    to uint16 and finish in 16-bit lanes: bf16 bits (exp=134) 0x4300 | v
    == 128 + v exactly for v in [0,15]."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    lo = jax.lax.bitcast_convert_type(
        ((p & 0x0F) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    hi = jax.lax.bitcast_convert_type(
        ((p >> 4) | 0x4300).astype(jnp.uint16), jnp.bfloat16)
    s = s_ref[:].astype(jnp.bfloat16)
    tkh, to = p.shape
    sexp = _expand_scales(s, tkh, to)
    wlo = (lo - 136.0) * sexp
    whi = (hi - 136.0) * sexp
    acc = jnp.dot(xe_ref[:], wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k_f32x(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    """f32 mantissa-OR trick: 0x4B000000 | v == 2^23 + v exactly; saves the
    int→float converts of the i32 path."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    magic = jnp.int32(0x4B000000)
    lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    tkh, to = p.shape
    sexp = _expand_scales(s, tkh, to)
    off = jnp.float32(8388608.0 + 8.0)
    wlo = ((lo - off) * sexp).astype(jnp.bfloat16)
    whi = ((hi - off) * sexp).astype(jnp.bfloat16)
    acc = jnp.dot(xe_ref[:], wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:], whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k_f32f(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    """Magic-OR + prefolded bias FMA + **f32 MXU dot**: drops BOTH per-plane
    bf16 converts of f32x.  At decode batch the MXU is idle enough that the
    slower f32 matmul rate doesn't bind; the VPU op chain per byte becomes
    widen, and/or, shr/or, 2xFMA."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    magic = jnp.int32(0x4B000000)
    lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    tkh, to = p.shape
    sexp = _expand_scales(s, tkh, to)
    bexp = sexp * jnp.float32(-(8388608.0 + 8.0))
    wlo = lo * sexp + bexp
    whi = hi * sexp + bexp
    xe = xe_ref[:].astype(jnp.float32)
    xo = xo_ref[:].astype(jnp.float32)
    acc = jnp.dot(xe, wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo, whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k_f32xf(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    """f32x WITHOUT the per-plane bf16 casts: planes stay f32 and the MXU
    dot runs f32 (x cast to f32 is per-activation-element, not per-weight).
    Saves 2 ops per weight element vs f32x; the bias is subtracted BEFORE
    the scale multiply (the folded-bias FMA form cancels catastrophically —
    never use it)."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    magic = jnp.int32(0x4B000000)
    lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
    s = s_ref[:].astype(jnp.float32)
    tkh, to = p.shape
    sexp = _expand_scales(s, tkh, to)
    off = jnp.float32(8388608.0 + 8.0)
    wlo = (lo - off) * sexp
    whi = (hi - off) * sexp
    acc = jnp.dot(xe_ref[:].astype(jnp.float32), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:].astype(jnp.float32), whi,
                   preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k_i32f(xe_ref, xo_ref, p_ref, s_ref, o_ref):
    """i32 unpack + f32 dot (no bf16 converts), scale via plain multiply."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    p = p_ref[:].astype(jnp.int32)
    lo = (p & 0x0F) - 8
    hi = (p >> 4) - 8
    s = s_ref[:].astype(jnp.float32)
    tkh, to = p.shape
    sexp = _expand_scales(s, tkh, to)
    wlo = lo.astype(jnp.float32) * sexp
    whi = hi.astype(jnp.float32) * sexp
    xe = xe_ref[:].astype(jnp.float32)
    xo = xo_ref[:].astype(jnp.float32)
    acc = jnp.dot(xe, wlo, preferred_element_type=jnp.float32)
    acc += jnp.dot(xo, whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def _k_res(xe_ref, xo_ref, p_ref, s_ref, o_ref, *, chunk):
    """x-RESIDENT variant: k-grid of ONE (the whole half-K is one block, so
    the activations are DMA'd once, not once per o tile) with the dequant
    chunked inside the kernel so temporaries stay small while the packed
    tile is tall.  f32x math (mantissa-OR, no int→float converts)."""
    tkh, to = p_ref.shape
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    nch = tkh // chunk
    nbc = chunk // 16

    def body(c, acc):
        p = p_ref[pl.ds(c * chunk, chunk), :].astype(jnp.int32)
        lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
        hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
        s = s_ref[pl.ds(c * nbc, nbc), :].astype(jnp.float32)
        sexp = _expand_scales(s, chunk, to)
        wlo = ((lo - off) * sexp).astype(jnp.bfloat16)
        whi = ((hi - off) * sexp).astype(jnp.bfloat16)
        acc += jnp.dot(xe_ref[:, pl.ds(c * chunk, chunk)], wlo,
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(xo_ref[:, pl.ds(c * chunk, chunk)], whi,
                       preferred_element_type=jnp.float32)
        return acc

    o_ref[:] = jax.lax.fori_loop(
        0, nch, body, jnp.zeros(o_ref.shape, jnp.float32))


@functools.partial(jax.jit, static_argnames=("block_o", "chunk"))
def res_matmul(xe, xo, packed, scales, *, block_o, chunk=512):
    N, half_k = xe.shape
    O = packed.shape[1]
    grid = (pl.cdiv(O, block_o),)
    return pl.pallas_call(
        functools.partial(_k_res, chunk=min(chunk, half_k)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, half_k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, half_k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half_k, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((half_k // 16, block_o), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, block_o), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
    )(xe, xo, packed, scales)


def _k_w32(xre_ref, xro_ref, p_ref, s_ref, o_ref, *, block_kh):
    """Word-packed variant: 4 consecutive packed bytes ride ONE int32 lane
    (host repack, pack_w32), so nibble extraction runs entirely in i32 lanes
    with NO u8→i32 widening relayout.  Plane j of a tile = original rows
    {4r'+j}; the activations arrive pre-permuted per tile (x_reorder_w32) so
    each plane's x is a CONTIGUOUS lane slice.  Scale expansion collapses to
    one 4x broadcast shared by all 8 plane dequants (block of plane row r'
    is r'//4 for every j)."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    w = p_ref[:]  # [bkh, TO] int32, 4 packed bytes per lane
    bkh, to = w.shape
    s = s_ref[:].astype(jnp.float32)  # [bkh//4, TO]
    sexp = _expand_scales(s, bkh, to)  # block of plane row r' == r'//4
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    acc = jnp.zeros((xre_ref.shape[0], to), jnp.float32)
    for j in range(4):
        lo = jax.lax.bitcast_convert_type(
            ((w >> (8 * j)) & 0xF) | magic, jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            ((w >> (8 * j + 4)) & 0xF) | magic, jnp.float32)
        wlo = ((lo - off) * sexp).astype(jnp.bfloat16)
        whi = ((hi - off) * sexp).astype(jnp.bfloat16)
        xj = xre_ref[:, pl.ds(j * block_kh, block_kh)]
        yj = xro_ref[:, pl.ds(j * block_kh, block_kh)]
        acc += jnp.dot(xj, wlo, preferred_element_type=jnp.float32)
        acc += jnp.dot(yj, whi, preferred_element_type=jnp.float32)
    o_ref[:] += acc


def pack_w32(packed: np.ndarray) -> np.ndarray:
    """[K/2, O] uint8 → [K/8, O] int32: 4 consecutive K-rows per word."""
    hk, O = packed.shape
    assert hk % 4 == 0
    p = packed.reshape(hk // 4, 4, O).astype(np.uint32)
    w = p[:, 0] | (p[:, 1] << 8) | (p[:, 2] << 16) | (p[:, 3] << 24)
    return w.view(np.int32)


def x_reorder_w32(x_half: jnp.ndarray, block_kh: int) -> jnp.ndarray:
    """[N, K/2] plane → tile-local plane-major order: lane c = t*4bkh+4r'+j
    moves to [t, j, r'] so the kernel's per-plane x is a contiguous slice."""
    N, hk = x_half.shape
    t = hk // (4 * block_kh)
    return (x_half.reshape(N, t, block_kh, 4)
            .swapaxes(-1, -2).reshape(N, hk))


@functools.partial(jax.jit, static_argnames=("block_o", "block_kh",
                                             "interpret"))
def w32_matmul(xe, xo, w32, scales, *, block_o, block_kh, interpret=False):
    """block_kh counts int32 WORD rows (= 4 packed rows = 8 K elements)."""
    N, half_k = xe.shape
    O = w32.shape[1]
    nb_per_tile = block_kh // 4  # one Q4 block per 4 word rows
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, 4 * block_kh))
    xre = x_reorder_w32(xe, block_kh)
    xro = x_reorder_w32(xo, block_kh)
    return pl.pallas_call(
        functools.partial(_k_w32, block_kh=block_kh),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, 4 * block_kh), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, 4 * block_kh), lambda i, k: (0, k),
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
        interpret=interpret,
    )(xre, xro, w32, scales)


def check_numerics_w32(block_o=512, block_kh=128, interpret=False):
    from vsim_tpu.quant.q4 import dequantize_km

    rng = np.random.default_rng(1)
    O = K = 1024
    w = jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32)))
    w32 = jnp.asarray(pack_w32(np.asarray(w.packed)))
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    ref = (x.astype(jnp.float32) @ dequantize_km(w, jnp.float32))
    got = w32_matmul(x[:, 0::2], x[:, 1::2], w32, w.scales,
                     block_o=min(block_o, O), block_kh=min(block_kh, K // 8),
                     interpret=interpret)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    return float(jnp.max(jnp.abs(got - ref))) / scale


def _k_ps(x_ref, p_ref, slo_ref, shi_ref, o_ref, *, block_kh, half_k):
    """PLANE-SPLIT, GLUE-FREE variant: weights repacked so byte c holds
    elements (c, c + K/2) — the two activation planes become CONTIGUOUS
    halves of x, so the kernel takes the RAW [N, K] x (resident, whole-K
    block, no host-side deinterleave/pad/slice) and lane-slices per k step.
    Scales arrive as two inputs indexing the lo rows (c//32) and hi rows
    (K/64 + c//32).  Motivation: the model-level phase table shows ~50 us
    of host glue per production matmul call (wo: 71 us/call vs 18 us for
    the glue-free kernel) — 113 calls/step makes glue the B=1 wall."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    p = p_ref[:].astype(jnp.int32)
    lo = (p & 0x0F) - 8
    hi = (p >> 4) - 8
    tkh, to = p.shape
    sexp_lo = _expand_scales(slo_ref[:].astype(jnp.float32), tkh, to)
    sexp_hi = _expand_scales(shi_ref[:].astype(jnp.float32), tkh, to)
    wlo = (lo.astype(jnp.float32) * sexp_lo).astype(jnp.bfloat16)
    whi = (hi.astype(jnp.float32) * sexp_hi).astype(jnp.bfloat16)
    acc = jnp.dot(xlo.astype(jnp.bfloat16), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi.astype(jnp.bfloat16), whi,
                   preferred_element_type=jnp.float32)
    o_ref[:] += acc


def pack_ps(packed: np.ndarray) -> np.ndarray:
    """Interleaved K-major [K/2, O] (byte c = elements 2c|2c+1) →
    plane-split (byte c = elements c | c+K/2)."""
    hk, O = packed.shape
    K = 2 * hk
    lo_el = np.zeros((K, O), np.uint8)
    lo_el[0::2] = packed & 0x0F
    lo_el[1::2] = packed >> 4
    return (lo_el[:hk] | (lo_el[hk:] << 4)).astype(np.uint8)


@functools.partial(jax.jit, static_argnames=("block_o", "block_kh",
                                             "interpret"))
def ps_matmul(x, packed_ps, scales, *, block_o, block_kh, interpret=False):
    """x is the RAW [N, K] activation (N may be 1 — no host padding)."""
    N, K = x.shape
    half_k = K // 2
    O = packed_ps.shape[1]
    # plane-split: 32 consecutive packed rows share one block per plane
    # (vs 16 in the interleaved layout) — _expand_scales broadcasts 32x
    nb_per_tile = block_kh // QK
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))
    nb2 = half_k // QK  # hi plane's first scale row: block (K/2)/32
    return pl.pallas_call(
        functools.partial(_k_ps, block_kh=block_kh, half_k=half_k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, K), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),  # whole-x resident
            pl.BlockSpec((block_kh, block_o), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_per_tile, block_o), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nb_per_tile, block_o),
                         lambda i, k, nb2=nb2: (nb2 // nb_per_tile + k, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, block_o), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x, packed_ps, scales, scales)


def check_numerics_ps(block_o=512, block_kh=128, N=8, interpret=False):
    from vsim_tpu.quant.q4 import dequantize_km

    rng = np.random.default_rng(1)
    O = K = 1024
    w = jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32)))
    pps = jnp.asarray(pack_ps(np.asarray(w.packed)))
    x = jnp.asarray(rng.standard_normal((N, K)), jnp.bfloat16)
    ref = (x.astype(jnp.float32) @ dequantize_km(w, jnp.float32))
    got = ps_matmul(x, pps, w.scales, block_o=min(block_o, O),
                    block_kh=min(block_kh, K // 2), interpret=interpret)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    return float(jnp.max(jnp.abs(got - ref))) / scale


KERNELS = {"dma": _k_dma, "i32": _k_i32, "u16": _k_u16, "f32x": _k_f32x,
           "f32f": _k_f32f, "i32f": _k_i32f, "f32xf": _k_f32xf}


@functools.partial(jax.jit, static_argnames=("variant", "block_o", "block_kh"))
def variant_matmul(xe, xo, packed, scales, *, variant, block_o, block_kh):
    N, half_k = xe.shape
    O = packed.shape[1]
    nb_per_tile = block_kh // (QK // 2)
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))
    return pl.pallas_call(
        KERNELS[variant],
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, block_kh), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((N, block_kh), lambda i, k: (0, k),
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
    )(xe, xo, packed, scales)


def bench(O, K, batch, fn, iters=24, reps_in_step=8, w_transform=None,
          single_x=False):
    """reps_in_step chained kernel invocations per jit dispatch amortize the
    per-dispatch launch overhead (~0.2 ms) below the kernel time.
    ``w_transform(packed_np) -> array`` substitutes a repacked weight
    (e.g. pack_w32/pack_ps); ``single_x`` feeds the raw [N, K] x instead of
    pre-split planes (the ps glue-free contract)."""
    rng = np.random.default_rng(0)
    w = Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32))
    wp = (jnp.asarray(w_transform(np.asarray(w.packed)))
          if w_transform is not None else w.packed)
    w = jax.device_put(w)
    wp = jax.device_put(wp)
    x0 = jnp.asarray(rng.standard_normal((batch, K)), jnp.bfloat16)
    xe0, xo0 = x0[:, 0::2], x0[:, 1::2]

    if single_x:
        @jax.jit
        def step(xe, xo):
            x = x0 + xe[:, :1]  # consume the chain input
            for _ in range(reps_in_step):
                y = fn(x, wp, w.scales)
                x = x0 + (y[:, :1] * 1e-9).astype(jnp.bfloat16)
            return x[:, 0::2], x[:, 1::2]
    else:
        @jax.jit
        def step(xe, xo):
            for _ in range(reps_in_step):
                y = fn(xe, xo, wp, w.scales)
                d = (y[:, :1] * 1e-9).astype(jnp.bfloat16)
                xe, xo = xe0 + d, xo0 + d
            return xe, xo

    xe, xo = step(xe0, xo0)
    float(xe.sum())

    def run(n):
        xe, xo = xe0, xo0
        t0 = time.perf_counter()
        for _ in range(n):
            xe, xo = step(xe, xo)
        float(xe.sum())
        return time.perf_counter() - t0

    run(4)
    t_short = min(run(4) for _ in range(2))
    t_long = min(run(iters) for _ in range(2))
    per_step = (t_long - t_short) / (iters - 4) / reps_in_step
    return per_step * 1e3, w.nbytes / per_step / 1e9


def check_numerics(variant, block_o=512, block_kh=2048):
    """Max |err| vs the f32 XLA oracle on a small case."""
    from vsim_tpu.quant.q4 import dequantize_km

    rng = np.random.default_rng(1)
    O = K = 1024
    w = jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32)))
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    ref = (x.astype(jnp.float32) @ dequantize_km(w, jnp.float32))
    got = variant_matmul(
        x[:, 0::2], x[:, 1::2], w.packed, w.scales,
        variant=variant, block_o=min(block_o, O), block_kh=min(block_kh, K // 2))
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    return float(jnp.max(jnp.abs(got - ref))) / scale


def check_numerics_res(block_o=512, chunk=512):
    from vsim_tpu.quant.q4 import dequantize_km

    rng = np.random.default_rng(1)
    O = K = 1024
    w = jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32)))
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.bfloat16)
    ref = (x.astype(jnp.float32) @ dequantize_km(w, jnp.float32))
    got = res_matmul(x[:, 0::2], x[:, 1::2], w.packed, w.scales,
                     block_o=min(block_o, O), chunk=chunk)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    return float(jnp.max(jnp.abs(got - ref))) / scale


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--sweep-blocks", action="store_true")
    ap.add_argument("--shape", default="4096,4096",
                    help="O,K of the weight (e.g. 4096,16384 = GPT-J proj)")
    ap.add_argument("--variants", default="dma,i32,f32x,res")
    args = ap.parse_args()
    print(f"device={jax.devices()[0].device_kind} batch={args.batch}",
          flush=True)

    # omitted variants (Mosaic legalization failures, measured 2026-08-18):
    # i8f — no vector<i8> subtract; 16-bit-native unpack — no vector<i16>
    # shift/and.  u16 therefore unpacks in i32 and narrows.
    O, K = (int(t) for t in args.shape.split(","))
    for v in args.variants.split(","):
        if v == "w32":
            # block_kh here counts int32 WORD rows (4 packed rows each)
            for (bo, bkhw) in ([(2048, 128), (2048, 64), (1024, 256),
                                (2048, 256)]
                               if args.sweep_blocks else [(2048, 128)]):
                bo2 = min(bo, O)
                bkhw2 = min(bkhw, K // 8)
                try:
                    fn = functools.partial(w32_matmul, block_o=bo2,
                                           block_kh=bkhw2)
                    ms, gbs = bench(O, K, args.batch, fn,
                                    w_transform=pack_w32)
                    err = f"{check_numerics_w32(bo2, bkhw2):.2e}"
                    print(f"w32  bo={bo2:5d} khw={bkhw2:4d}  {ms:7.3f} ms "
                          f"{gbs:7.1f} GB/s  relerr={err}", flush=True)
                except Exception as e:
                    print(f"w32  bo={bo2:5d} khw={bkhw2:4d}  FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        if v == "ps":
            for (bo, bkh) in ([(2048, 512), (2048, 1024), (1024, 512),
                               (2048, 256)]
                              if args.sweep_blocks else [(2048, 512)]):
                bo2, bkh2 = min(bo, O), min(bkh, K // 2)
                try:
                    fn = functools.partial(ps_matmul, block_o=bo2,
                                           block_kh=bkh2)
                    ms, gbs = bench(O, K, args.batch, fn,
                                    w_transform=pack_ps, single_x=True)
                    err = f"{check_numerics_ps(bo2, bkh2, N=args.batch):.2e}"
                    print(f"ps   bo={bo2:5d} bkh={bkh2:4d}  {ms:7.3f} ms "
                          f"{gbs:7.1f} GB/s  relerr={err}", flush=True)
                except Exception as e:
                    print(f"ps   bo={bo2:5d} bkh={bkh2:4d}  FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        if v == "gi":
            # production grouped-integer ps kernel (ops/pallas_q4.py): the
            # offset-8 and the scale multiply both fold into a per-group
            # rescale of MXU-exact integer partial sums
            from vsim_tpu.ops.pallas_q4 import _pallas_q4_matmul_ps_2d

            for (bo, bkh) in ([(2048, 256), (2048, 128), (4096, 256),
                               (4096, 128), (1024, 256), (2048, 512),
                               (1024, 128), (4096, 64), (2048, 64)]
                              if args.sweep_blocks else [(2048, 256)]):
                bo2, bkh2 = min(bo, O), min(bkh, K // 2)
                try:
                    def fn(x, wp, scales, bo2=bo2, bkh2=bkh2):
                        return _pallas_q4_matmul_ps_2d(
                            x, wp, scales, None, block_o=bo2, block_kh=bkh2,
                            acc_dtype=jnp.bfloat16, interpret=False,
                            math="gi", has_bias=False)
                    ms, gbs = bench(O, K, args.batch, fn,
                                    w_transform=pack_ps, single_x=True)
                    rng = np.random.default_rng(1)
                    Ok = Kk = 1024
                    from vsim_tpu.quant.q4 import dequantize_km
                    wt = jax.device_put(Q4Tensor.from_dense_np(
                        rng.standard_normal((Ok, Kk)).astype(np.float32)))
                    xt = jnp.asarray(
                        rng.standard_normal((args.batch, Kk)), jnp.bfloat16)
                    reft = (xt.astype(jnp.float32)
                            @ dequantize_km(wt, jnp.float32))
                    gott = _pallas_q4_matmul_ps_2d(
                        xt, jnp.asarray(pack_ps(np.asarray(wt.packed))),
                        wt.scales, None, block_o=min(bo2, Ok),
                        block_kh=min(bkh2, Kk // 2),
                        acc_dtype=jnp.bfloat16, interpret=False, math="gi",
                        has_bias=False)
                    err = (float(jnp.max(jnp.abs(gott - reft)))
                           / (float(jnp.max(jnp.abs(reft))) or 1.0))
                    print(f"gi   bo={bo2:5d} bkh={bkh2:4d}  {ms:7.3f} ms "
                          f"{gbs:7.1f} GB/s  relerr={err:.2e}", flush=True)
                except Exception as e:
                    print(f"gi   bo={bo2:5d} bkh={bkh2:4d}  FAILED "
                          f"{type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        if v == "res":
            for (bo, chunk) in ([(256, 512), (512, 512), (256, 1024),
                                 (1024, 512), (512, 256)]
                                if args.sweep_blocks else [(256, 512)]):
                try:
                    fn = functools.partial(res_matmul, block_o=bo,
                                           chunk=chunk)
                    ms, gbs = bench(O, K, args.batch, fn)
                    err = f"{check_numerics_res(bo, chunk):.2e}"
                    print(f"res  bo={bo:5d} chk={chunk:5d}  {ms:7.3f} ms "
                          f"{gbs:7.1f} GB/s  relerr={err}", flush=True)
                except Exception as e:
                    print(f"res  bo={bo:5d} chk={chunk:5d}  FAILED "
                          f"{type(e).__name__}: {e}", flush=True)
            continue
        for (bo, bkh) in ([(2048, 512), (2048, 256), (1024, 512),
                           (4096, 512), (2048, 1024)]
                          if args.sweep_blocks and v in ("u16", "f32x", "dma")
                          else [(2048, 512)]):
            bkh = min(bkh, K // 2)
            bo = min(bo, O)
            try:
                fn = functools.partial(variant_matmul, variant=v,
                                       block_o=bo, block_kh=bkh)
                ms, gbs = bench(O, K, args.batch, fn)
                err = ("-" if v == "dma"
                       else f"{check_numerics(v, bo, bkh):.2e}")
                print(f"{v:4s} bo={bo:5d} bkh={bkh:5d}  {ms:7.3f} ms "
                      f"{gbs:7.1f} GB/s  relerr={err}", flush=True)
            except Exception as e:
                print(f"{v:4s} bo={bo:5d} bkh={bkh:5d}  FAILED "
                      f"{type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
