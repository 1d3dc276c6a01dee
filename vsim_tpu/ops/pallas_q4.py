"""Pallas fused dequant+matmul — the reference's IMAX offload kernel reborn.

Reference (imax.c:1133-2292): the Q4 dot is staged onto the CGRA as
LOOP1(cols) × LOOP0(blocks) pipelines of FML3/FMA/FAD intrinsics with the
weight cpyin'd to device LMM and an LMM-capacity CPU fallback
(imax.c:2103-2138).  TPU mapping (SURVEY.md N8 row):

  LMM              → VMEM tiles (BlockSpec-managed, double-buffered by Pallas)
  xmax_cpyin/out   → implicit HBM→VMEM pipeline of the grid
  lane macro-pipe  → grid pipelining
  LMM-overflow CPU fallback → K-blocked grid (never overflows, no fallback)
  FML3 int4-index dequant   → nibble unpack + scale multiply on the VPU
  FAD reduction tree        → MXU dot accumulation

Layout contract (vsim_tpu/quant/q4.py): weights are K-major —
``packed [K/2, O]`` uint8 (byte c = elements 2c|2c+1), ``scales [K/32, O]``.
The kernel never transposes: the byte's two nibble planes become two
[TKh, TO] weight tiles dotted against the even/odd element planes of x, so

    y = x @ W^T = x_even @ deq(lo_plane) + x_odd @ deq(hi_plane)

with both dots in natural [N, K/2] @ [K/2, O] MXU form, and the per-block
scales expanding along sublanes with a broadcast-reshape (no lane shuffles).

Decode geometry (2026-08-21): the bench phase table measured the stacked
matmuls at 170-370 GB/s effective while this same dequant math reaches
715 GB/s at the lm-head shape.  Root cause: for big-K weights at decode
batch, the old _pick_blocks chose tall-narrow [8192, 128] tiles — the o
axis is the DMA minor dim of the K-major layout, so those tiles issue
128-byte strided HBM bursts (199 GB/s measured on the 16384→4096 proj).
Decode geometry is now wide-o ([512, 2048] tiles → 2 KB contiguous
bursts); the k-grid this creates only re-streams the tiny activation
block.  (An in-kernel x deinterleave that would also remove the host-side
slice ops was tried and rejected by Mosaic — see _kernel.)

Weight bytes read per output tile ≈ 4.5 bits/element — the speed-of-light
target for HBM-bound decode.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vsim_tpu.quant.q4 import QK, Q4Tensor


# Dequant math variant, settable for A/B on the full model (tools/kernel_lab
# microbenches are noise-limited on this 2-core host):
#   i32   — int unpack, sitofp, f32 scale mul, cast to acc_dtype (original)
#   f32x  — mantissa-OR bitcast (0x4B000000 | v == 2^23 + v), subtract the
#           offset BEFORE the scale multiply (the folded-bias FMA form
#           cancels catastrophically — never fold), cast to acc_dtype
#   f32xf — f32x but planes stay f32 and the dot runs f32 (drops both
#           per-weight-element casts; x is cast instead, which is per-
#           activation-element)
#   gi    — grouped-integer (decode, n <= 8, ps layout only): nibbles enter
#           the MXU as exact small integers in bf16; offset-8 and the scale
#           both fold into an O(K/32·O) per-group rescale of the integer
#           partial sums (block-diagonal activation expansion).  Measured
#           r4: GPT-J-6B B=1 6.43 → 5.15 ms, with a DMA-probe kernel
#           confirming the giw variant runs AT the chip's measured HBM
#           streaming ceiling (~530-690 GB/s on these patterns).  Falls
#           back to f32xf for n > 8 / non-ps / misaligned shapes.
_DEQUANT_MATH = "gi"


def set_dequant_math(name: str) -> None:
    global _DEQUANT_MATH
    assert name in ("i32", "f32x", "f32xf", "gi")
    _DEQUANT_MATH = name


def get_dequant_math() -> str:
    return _DEQUANT_MATH


def _dequant_planes(p_ref, s_ref, acc_dtype, stacked: bool, math=None):
    p = (p_ref[0] if stacked else p_ref[:]).astype(jnp.int32)
    s = (s_ref[0] if stacked else s_ref[:]).astype(jnp.float32)
    nb, to = s.shape
    tkh = p.shape[0]
    # each Q4 block covers 16 consecutive rows of each nibble plane
    sexp = jnp.broadcast_to(s[:, None, :], (nb, tkh // nb, to)).reshape(tkh, to)
    math = math or _DEQUANT_MATH
    if math == "gi":  # grouped-integer exists only for the ps kernels
        math = "f32xf"
    if math == "i32":
        lo = (p & 0x0F) - 8  # elements k = 2c   (low nibble)
        hi = (p >> 4) - 8  # elements k = 2c+1 (high nibble)
        wlo = (lo.astype(jnp.float32) * sexp).astype(acc_dtype)
        whi = (hi.astype(jnp.float32) * sexp).astype(acc_dtype)
        return wlo, whi
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
    out_dt = jnp.float32 if math == "f32xf" else acc_dtype
    wlo = ((lo - off) * sexp).astype(out_dt)
    whi = ((hi - off) * sexp).astype(out_dt)
    return wlo, whi


def _kernel(xe_ref, xo_ref, p_ref, s_ref, o_ref, *, acc_dtype, math):
    """One (o_tile, k_tile) grid step: dequantize a [TKh, TO] packed tile and
    accumulate two half-K dots into the output tile.

    The even/odd activation planes arrive pre-sliced from the host graph
    (``x[:, 0::2]``/``x[:, 1::2]`` — XLA fuses the strided slice into the
    producing elementwise op); an in-kernel ``reshape(N, TKh, 2)``
    deinterleave was tried and rejected by Mosaic ("infer-vector-layout:
    unsupported shape cast", 2026-08-21)."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    wlo, whi = _dequant_planes(p_ref, s_ref, acc_dtype, stacked=False,
                               math=math)
    acc = jnp.dot(xe_ref[:].astype(wlo.dtype), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xo_ref[:].astype(whi.dtype), whi,
                   preferred_element_type=jnp.float32)
    o_ref[:] += acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_o", "block_kh", "acc_dtype", "interpret",
                     "math"),
)
def _pallas_q4_matmul_2d(
    xe: jnp.ndarray,  # [N, K/2]
    xo: jnp.ndarray,  # [N, K/2]
    packed: jnp.ndarray,  # [K/2, O] uint8
    scales: jnp.ndarray,  # [K/32, O]
    *,
    block_o: int,
    block_kh: int,
    acc_dtype,
    interpret: bool,
    math: str = "i32",
) -> jnp.ndarray:
    N, half_k = xe.shape
    O = packed.shape[1]
    nb_per_tile = block_kh // (QK // 2)

    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))

    out = pl.pallas_call(
        functools.partial(_kernel, acc_dtype=acc_dtype, math=math),
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
        cost_estimate=pl.CostEstimate(
            flops=2 * N * half_k * 2 * O,
            bytes_accessed=packed.size + scales.size * scales.dtype.itemsize
            + xe.size * xe.dtype.itemsize * 2 * grid[0] + N * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, packed, scales)
    return out


def _dequant_planes_ps(p_ref, s_ref, k_step, acc_dtype, math,
                       block_kh, half_k):
    """Plane-split dequant: 32 consecutive packed rows share one block per
    plane; lo and hi planes read DIFFERENT scale rows (c//32 vs
    K/64 + c//32).  The scales ref carries ALL rows of the o tile (whole-row
    blocks — small-K models produce sub-8-row per-k tiles that Mosaic
    rejects) and the two per-plane row ranges are pl.ds-sliced here."""
    p = p_ref[:].astype(jnp.int32)
    tkh, to = p.shape
    nb = block_kh // QK  # blocks per plane per tile
    nb2 = half_k // QK  # hi plane scale-row offset

    def expand(rows):
        s = rows.astype(jnp.float32)
        return jnp.broadcast_to(
            s[:, None, :], (nb, tkh // nb, to)).reshape(tkh, to)

    sexp_lo = expand(s_ref[pl.ds(k_step * nb, nb), :])
    sexp_hi = expand(s_ref[pl.ds(nb2 + k_step * nb, nb), :])
    math = math or _DEQUANT_MATH
    if math == "gi":  # gi has its own kernels; treat as f32xf here
        math = "f32xf"
    if math == "i32":
        lo = (p & 0x0F) - 8
        hi = (p >> 4) - 8
        return ((lo.astype(jnp.float32) * sexp_lo).astype(acc_dtype),
                (hi.astype(jnp.float32) * sexp_hi).astype(acc_dtype))
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    lo = jax.lax.bitcast_convert_type((p & 0x0F) | magic, jnp.float32)
    hi = jax.lax.bitcast_convert_type((p >> 4) | magic, jnp.float32)
    out_dt = jnp.float32 if math == "f32xf" else acc_dtype
    return (((lo - off) * sexp_lo).astype(out_dt),
            ((hi - off) * sexp_hi).astype(out_dt))


def _kernel_ps_bias(x_ref, p_ref, s_ref, b_ref, o_ref, *,
                    acc_dtype, math, block_kh, half_k):
    """_kernel_ps with the bias folded in: the k==0 output init IS the bias
    row (broadcast over N) — saves the separate XLA bias-add op per call."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.broadcast_to(
            b_ref[:].astype(jnp.float32), o_ref.shape)

    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    wlo, whi = _dequant_planes_ps(p_ref, s_ref, k_step, acc_dtype, math,
                                  block_kh, half_k)
    acc = jnp.dot(xlo.astype(wlo.dtype), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi.astype(whi.dtype), whi,
                   preferred_element_type=jnp.float32)
    o_ref[:] += acc.astype(o_ref.dtype)


def _gi_planes_and_bd(x_ref, p_ref, k_step, block_kh, half_k, n):
    """Shared setup for the grouped-integer (gi) kernels: unpack the nibble
    planes as EXACT small integers in bf16 (no per-element offset or scale
    — both fold into the per-group rescale), and expand each activation
    plane into its [n*G, TKh] block-diagonal form so ONE MXU dot yields all
    per-group partial sums.

    Why: the f32xf math pays ~4 VPU ops per weight element (and a sublane
    broadcast-expand of the scales) BEFORE the dot — measured 440-580 GB/s
    against 600-950 GB/s DMA ceilings, i.e. in-kernel dequant arithmetic
    starves the DMA (BASELINE.md r3 phase table).  Here the per-element
    work is and/shift + int→bf16 convert only; the offset-8 correction uses
    the per-group activation sums (y_g = s_g·(Σ x·v − 8·Σ x), exact in f32
    because bf16 x times v ≤ 15 is exact) and the scale multiply runs on
    the [G, TO] partials — O(K/32·O) instead of O(K·O).  The reference's
    analogue of this dot is the per-row FML3/FMA CGRA pipe
    (imax.c:2204-2283); the TPU-native answer is MXU integer-exact dots."""
    G = block_kh // QK
    p = p_ref[:].astype(jnp.int32)
    vlo = (p & 0x0F).astype(jnp.bfloat16)  # exact: values 0..15
    vhi = (p >> 4).astype(jnp.bfloat16)
    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    c_grp = jax.lax.broadcasted_iota(jnp.int32, (G, block_kh), 1) // QK
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (G, block_kh), 0)
    # 0/1 selector built in integer arithmetic — an i1 vector here trips a
    # Mosaic relayout ("non-singleton dim replicated in destination")
    maskf = jnp.maximum(1 - jnp.abs(c_grp - g_ids), 0).astype(
        jnp.float32).astype(jnp.bfloat16)  # [G, TKh]

    def bd(x):  # [N, TKh] -> [n*G, TKh] (static n <= 8: unrolled 2D ops)
        rows = [maskf * x[i:i + 1, :].astype(jnp.bfloat16) for i in range(n)]
        return rows[0] if n == 1 else jnp.concatenate(rows, axis=0)

    return vlo, vhi, bd(xlo), bd(xhi), G


def _gi_rescale(part_lo, part_hi, xs_lo, xs_hi, s_lo, s_hi, G, n, to):
    """y[i] = Σ_g s_lo[g]·(part_lo[i·G+g] − 8·xs_lo[i·G+g]) + (hi)."""
    outs = []
    for i in range(n):
        pl_i = part_lo[i * G:(i + 1) * G, :] - 8.0 * xs_lo[i * G:(i + 1) * G]
        ph_i = part_hi[i * G:(i + 1) * G, :] - 8.0 * xs_hi[i * G:(i + 1) * G]
        outs.append(jnp.sum(s_lo * pl_i + s_hi * ph_i, axis=0,
                            keepdims=True))
    return outs[0] if n == 1 else jnp.concatenate(outs, axis=0)


def _kernel_ps_gi(x_ref, p_ref, s_ref, o_ref, *, block_kh, half_k, n):
    """Grouped-integer plane-split kernel (decode shapes, n <= 8)."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    vlo, vhi, xbd_lo, xbd_hi, G = _gi_planes_and_bd(
        x_ref, p_ref, k_step, block_kh, half_k, n)
    part_lo = jnp.dot(xbd_lo, vlo, preferred_element_type=jnp.float32)
    part_hi = jnp.dot(xbd_hi, vhi, preferred_element_type=jnp.float32)
    xs_lo = jnp.sum(xbd_lo.astype(jnp.float32), axis=1, keepdims=True)
    xs_hi = jnp.sum(xbd_hi.astype(jnp.float32), axis=1, keepdims=True)
    nb2 = half_k // QK
    s_lo = s_ref[pl.ds(k_step * G, G), :].astype(jnp.float32)
    s_hi = s_ref[pl.ds(nb2 + k_step * G, G), :].astype(jnp.float32)
    to = p_ref.shape[1]
    o_ref[:] += _gi_rescale(part_lo, part_hi, xs_lo, xs_hi, s_lo, s_hi,
                            G, n, to)


def _kernel_ps_gi_bias(x_ref, p_ref, s_ref, b_ref, o_ref, *,
                       block_kh, half_k, n):
    """_kernel_ps_gi with the bias as the k==0 output init."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.broadcast_to(
            b_ref[:].astype(jnp.float32), o_ref.shape)

    vlo, vhi, xbd_lo, xbd_hi, G = _gi_planes_and_bd(
        x_ref, p_ref, k_step, block_kh, half_k, n)
    part_lo = jnp.dot(xbd_lo, vlo, preferred_element_type=jnp.float32)
    part_hi = jnp.dot(xbd_hi, vhi, preferred_element_type=jnp.float32)
    xs_lo = jnp.sum(xbd_lo.astype(jnp.float32), axis=1, keepdims=True)
    xs_hi = jnp.sum(xbd_hi.astype(jnp.float32), axis=1, keepdims=True)
    nb2 = half_k // QK
    s_lo = s_ref[pl.ds(k_step * G, G), :].astype(jnp.float32)
    s_hi = s_ref[pl.ds(nb2 + k_step * G, G), :].astype(jnp.float32)
    to = p_ref.shape[1]
    o_ref[:] += _gi_rescale(part_lo, part_hi, xs_lo, xs_hi, s_lo, s_hi,
                            G, n, to)


def _kernel_ps_giw(x_ref, p_ref, slo_ref, shi_ref, b_ref, o_ref, *,
                   block_kh, half_k, n, ochunk, has_bias, kchunk=None):
    """Grouped-integer kernel with the OUTPUT resident and a pure k-grid:
    the packed tile is a [block_kh, O] full-width row band — ONE contiguous
    HBM read per grid step (the 2D o×k grid's [256, bo] tiles are 256
    strided bursts each; kernel_lab showed contiguous whole-O tiles at
    ~900 GB/s vs ~620 strided).  The dequant+dot runs in o-chunks of
    ``ochunk`` inside the kernel so VMEM temporaries stay bounded while the
    DMA tile is wide.  Output [N, O] (f32, <= 512 KB at decode shapes)
    lives in VMEM across all k steps and is written back once.

    ``kchunk`` splits the BD dot along the contraction: the gi math costs
    G x MXU flops (groups are 32 wide vs the MXU's 128 contraction), so a
    [block_kh=256]-band single dot runs at 8x plain flops; two 128-deep
    dots (kchunk=128) halve that to the 4x floor while keeping full
    contraction depth — the difference between MXU-bound and DMA-bound at
    batch n = 16-32 (r5 batch campaign; n <= 8 is DMA-bound either way)."""
    k_step = pl.program_id(0)

    @pl.when(k_step == 0)
    def _():
        if has_bias:
            o_ref[:] = jnp.broadcast_to(
                b_ref[:].astype(jnp.float32), o_ref.shape)
        else:
            o_ref[:] = jnp.zeros_like(o_ref)

    kc = kchunk or block_kh
    nsub = block_kh // kc
    g = kc // QK  # groups per sub-chunk
    c_grp = jax.lax.broadcasted_iota(jnp.int32, (g, kc), 1) // QK
    g_ids = jax.lax.broadcasted_iota(jnp.int32, (g, kc), 0)
    maskf = jnp.maximum(1 - jnp.abs(c_grp - g_ids), 0).astype(
        jnp.float32).astype(jnp.bfloat16)

    pad = max(0, 8 - n * g)  # keep Xbd at >= 8 sublanes

    def bd(x):
        rows = [maskf * x[i:i + 1, :].astype(jnp.bfloat16) for i in range(n)]
        if pad:
            rows.append(jnp.zeros((pad, kc), jnp.bfloat16))
        return rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)

    subs = []  # per sub-chunk: (xbd_lo, xbd_hi, xs_lo, xs_hi)
    for c in range(nsub):
        xlo = x_ref[:, pl.ds(k_step * block_kh + c * kc, kc)]
        xhi = x_ref[:, pl.ds(half_k + k_step * block_kh + c * kc, kc)]
        xbd_lo, xbd_hi = bd(xlo), bd(xhi)
        subs.append((xbd_lo, xbd_hi,
                     jnp.sum(xbd_lo.astype(jnp.float32), axis=1,
                             keepdims=True),
                     jnp.sum(xbd_hi.astype(jnp.float32), axis=1,
                             keepdims=True)))
    O = p_ref.shape[1]  # noqa: N806
    for j in range(O // ochunk):
        acc = None
        s_lo_all = slo_ref[:, pl.ds(j * ochunk, ochunk)].astype(jnp.float32)
        s_hi_all = shi_ref[:, pl.ds(j * ochunk, ochunk)].astype(jnp.float32)
        for c in range(nsub):
            p = p_ref[pl.ds(c * kc, kc),
                      pl.ds(j * ochunk, ochunk)].astype(jnp.int32)
            vlo = (p & 0x0F).astype(jnp.bfloat16)
            vhi = (p >> 4).astype(jnp.bfloat16)
            xbd_lo, xbd_hi, xs_lo, xs_hi = subs[c]
            part_lo = jnp.dot(xbd_lo, vlo,
                              preferred_element_type=jnp.float32)
            part_hi = jnp.dot(xbd_hi, vhi,
                              preferred_element_type=jnp.float32)
            r = _gi_rescale(
                part_lo[:n * g], part_hi[:n * g], xs_lo[:n * g],
                xs_hi[:n * g], s_lo_all[c * g:(c + 1) * g],
                s_hi_all[c * g:(c + 1) * g], g, n, ochunk)
            acc = r if acc is None else acc + r
        o_ref[:, pl.ds(j * ochunk, ochunk)] += acc


@functools.partial(
    jax.jit,
    static_argnames=("block_kh", "ochunk", "interpret", "has_bias",
                     "kchunk"),
)
def _pallas_q4_matmul_ps_giw(
    x: jnp.ndarray,  # [N, K] raw activations, N <= 32
    packed: jnp.ndarray,  # [K/2, O] uint8, plane-split
    scales: jnp.ndarray,  # [K/32(+pad), O]
    bias,  # [1, O] f32 or None
    *,
    block_kh: int,
    ochunk: int,
    interpret: bool,
    has_bias: bool,
    kchunk: int | None = None,
) -> jnp.ndarray:
    N, K = x.shape
    half_k = K // 2
    O = packed.shape[1]
    G = block_kh // QK
    nb2 = half_k // QK  # hi plane's first scale row
    grid = (half_k // block_kh,)

    in_specs = [
        pl.BlockSpec((N, K), lambda k: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((block_kh, O), lambda k: (k, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((G, O), lambda k: (k, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((G, O), lambda k, nb2=nb2, G=G: (nb2 // G + k, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scales, scales]
    if has_bias:
        in_specs.append(pl.BlockSpec((1, O), lambda k: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(bias)
    else:  # keep the kernel signature static: pass scales as a dummy
        in_specs.append(pl.BlockSpec((1, O), lambda k: (0, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(jnp.zeros((1, O), jnp.float32))

    vmem_mb = int(os.environ.get("VSIM_GIW_VMEM_MB", "0"))
    cp = (pltpu.CompilerParams(dimension_semantics=("arbitrary",),
                               vmem_limit_bytes=vmem_mb << 20)
          if vmem_mb else
          pltpu.CompilerParams(dimension_semantics=("arbitrary",)))
    return pl.pallas_call(
        functools.partial(_kernel_ps_giw, block_kh=block_kh, half_k=half_k,
                          n=N, ochunk=ochunk, has_bias=has_bias,
                          kchunk=kchunk),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N, O), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=cp,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * O,
            bytes_accessed=packed.size + scales.size * scales.dtype.itemsize
            + x.size * x.dtype.itemsize + N * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def _kernel_ps(x_ref, p_ref, s_ref, o_ref, *, acc_dtype, math,
               block_kh, half_k):
    """Glue-free plane-split kernel: x arrives RAW [N, K] (whole-K resident
    block — N may be 1, no host pad) and the two activation planes are
    contiguous lane ranges sliced in-kernel.  Motivation (2026-08-21 phase
    table): the production interleaved path spent ~50 us/call on host glue
    (pad-concat to 8 rows + 2 strided deinterleave slices + output slice) —
    113 calls/step made glue, not the kernel, the GPT-J B=1 decode wall."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xlo = x_ref[:, pl.ds(k_step * block_kh, block_kh)]
    xhi = x_ref[:, pl.ds(half_k + k_step * block_kh, block_kh)]
    wlo, whi = _dequant_planes_ps(p_ref, s_ref, k_step, acc_dtype, math,
                                  block_kh, half_k)
    acc = jnp.dot(xlo.astype(wlo.dtype), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xhi.astype(whi.dtype), whi,
                   preferred_element_type=jnp.float32)
    o_ref[:] += acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_o", "block_kh", "acc_dtype", "interpret", "math",
                     "has_bias"),
)
def _pallas_q4_matmul_ps_2d(
    x: jnp.ndarray,  # [N, K] raw activations
    packed: jnp.ndarray,  # [K/2, O] uint8, plane-split
    scales: jnp.ndarray,  # [K/32, O]
    bias,  # [1, O] f32 or None
    *,
    block_o: int,
    block_kh: int,
    acc_dtype,
    interpret: bool,
    math: str = "i32",
    has_bias: bool = False,
) -> jnp.ndarray:
    N, K = x.shape
    half_k = K // 2
    O = packed.shape[1]
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))

    in_specs = [
        pl.BlockSpec((N, K), lambda i, k: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((block_kh, block_o), lambda i, k: (k, i),
                     memory_space=pltpu.VMEM),
        # scales: ALL rows of the o tile (fetched once per o step; the
        # kernel row-slices both planes' ranges per k step)
        pl.BlockSpec((scales.shape[0], block_o), lambda i, k: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [x, packed, scales]
    gi = math == "gi" and N <= 8 and x.dtype == jnp.bfloat16
    if math == "gi":
        # gi fallback for batch shapes: f32x (bf16 planes) — the wide-o
        # short-K batch geometry needs the smaller dequant temporaries,
        # and at n > 8 the MXU prefers bf16 operands anyway.  f32
        # activations (full-f32 parity mode) keep f32 planes (ADVICE r4).
        math = ("f32x" if N > 8 and x.dtype == jnp.bfloat16 else "f32xf")
    if has_bias:
        in_specs.append(pl.BlockSpec((1, block_o), lambda i, k: (0, i),
                                     memory_space=pltpu.VMEM))
        operands.append(bias)
        if gi:
            kern = functools.partial(_kernel_ps_gi_bias, block_kh=block_kh,
                                     half_k=half_k, n=N)
        else:
            kern = functools.partial(
                _kernel_ps_bias, acc_dtype=acc_dtype, math=math,
                block_kh=block_kh, half_k=half_k)
    elif gi:
        kern = functools.partial(_kernel_ps_gi, block_kh=block_kh,
                                 half_k=half_k, n=N)
    else:
        kern = functools.partial(_kernel_ps, acc_dtype=acc_dtype, math=math,
                                 block_kh=block_kh, half_k=half_k)

    cp = (pltpu.CompilerParams(
              dimension_semantics=("parallel", "arbitrary"),
              vmem_limit_bytes=100 * 2**20)
          if os.environ.get("VSIM_PS_BIG_TILES")
          else pltpu.CompilerParams(
              dimension_semantics=("parallel", "arbitrary")))
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((N, block_o), lambda i, k: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=cp,
        cost_estimate=pl.CostEstimate(
            flops=2 * N * K * O,
            bytes_accessed=packed.size + scales.size * scales.dtype.itemsize
            + x.size * x.dtype.itemsize + N * O * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*operands)


def pallas_q4_matmul_ps(
    x: jnp.ndarray,
    w: Q4Tensor,  # layout == "ps"
    *,
    bias=None,  # optional [O] — folded into the kernel's output init
    acc_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x [..., K] @ w.T (+ bias) → [..., O]`` for plane-split weights: no
    host-side pad/deinterleave/output-slice glue at all."""
    assert w.layout == "ps", w.layout
    lead = x.shape[:-1]
    K = x.shape[-1]
    O = w.out_features
    n = 1
    for d in lead:
        n *= d
    # gi rounds activations to bf16 inside the kernel, so it only engages
    # when the caller's activations already ARE bf16 — f32 compute_dtype
    # (the documented full-f32 parity mode) keeps the f32xf math end to end
    # (ADVICE r4)
    gi_ok = (_DEQUANT_MATH == "gi" and n <= 8 and (K // 2) % 256 == 0
             and x.dtype == jnp.bfloat16)
    if gi_ok and 256 * O <= (4 << 20) and O % 128 == 0:
        # contiguous whole-O row bands (one DMA per grid step); the lm head
        # (O ~ 51200 > 16384) exceeds the 4 MB tile cap and takes the 2D
        # wide-divisor geometry below instead
        ochunk = 2048
        while O % ochunk:
            ochunk //= 2
        if bias is not None and bias.shape[-1] != O:
            bias = jnp.pad(bias, (0, O - bias.shape[-1]))
        bkh = int(os.environ.get("VSIM_GIW_BKH", "256"))
        if (K // 2) % bkh:
            bkh = 256
        y = _pallas_q4_matmul_ps_giw(
            x.reshape(n, K), w.packed, w.scales,
            None if bias is None
            else bias.astype(jnp.float32).reshape(1, O),
            block_kh=bkh, ochunk=ochunk, interpret=interpret,
            has_bias=bias is not None,
        )
        return y.reshape(*lead, O)
    blocks = _pick_blocks_gi(K // 2, O) if gi_ok else None
    if blocks is not None:
        block_o, block_kh = blocks
    else:
        block_o, block_kh = _pick_blocks(K // 2, O, max(n, 8))
    if block_kh % QK:  # ps scale rows need 32-row groups
        block_kh = max(QK, block_kh - block_kh % QK)
    if os.environ.get("VSIM_PS_BIG_TILES"):  # A/B: 2M-element tiles +
        # raised scoped-VMEM limit (see _pallas_q4_matmul_ps_2d)
        while (block_kh < 1024 and (K // 2) % (2 * block_kh) == 0
               and block_kh * block_o < (2 << 20)):
            block_kh *= 2
    if bias is not None and bias.shape[-1] != O:  # padded lm_head
        bias = jnp.pad(bias, (0, O - bias.shape[-1]))
    y = _pallas_q4_matmul_ps_2d(
        x.reshape(n, K), w.packed, w.scales,
        None if bias is None else bias.astype(jnp.float32).reshape(1, O),
        block_o=block_o, block_kh=block_kh,
        acc_dtype=acc_dtype, interpret=interpret, math=_DEQUANT_MATH,
        has_bias=bias is not None,
    )
    return y.reshape(*lead, O)


def _erf_poly(x):
    """In-kernel erf: Abramowitz–Stegun 7.1.26 rational-exp approximation,
    |abs err| <= 1.5e-7 — far below bf16 resolution.  Mosaic implements
    neither erf nor erfc (measured on v5e: both fail to lower), but exp and
    polynomials are native, so exact-GELU archs (NeoX/pythia — the
    reference's PRIMARY driver arch, vsim.cpp:749) can use the fused MLP
    kernel instead of paying the two-kernel MLP."""
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (1.421413741
            + t * (-1.453152027 + t * 1.061405429))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0, -y, y)


def _gelu_erf(v):
    """Exact-erf GELU via _erf_poly (HF NeoX/pythia use the erf form;
    jax.nn.gelu(approximate=False) lowers through erfc, unsupported by
    Mosaic)."""
    return 0.5 * v * (1.0 + _erf_poly(v * 0.7071067811865476))


def _kernel_mlp_ps(x_ref, pfc_lo_ref, pfc_hi_ref, sfc_lo_ref, sfc_hi_ref,
                   pp_ref, sp_lo_ref, sp_hi_ref, bfc_lo_ref, bfc_hi_ref,
                   bp_ref, o_ref, *, math, act, block_fh, chunk, E, F):
    """Fused MLP: ``o = act(x @ Wfc^T + bfc) @ Wproj^T + bproj`` in ONE
    kernel — the [N, F] intermediate never leaves VMEM and the per-layer
    matmul count on the decode path drops from 2 to 1 (kernel entry +
    inter-kernel XLA glue was the measured B=1 wall).

    Both weights are plane-split.  Grid step t covers the PAIRED F ranges
    [t*BFh, (t+1)*BFh) and [F/2 + t*BFh, ...): exactly the lo/hi nibble
    planes of Wproj's packed rows [t*BFh, (t+1)*BFh), so the two fc column
    tiles computed this step are the two h planes the proj tile consumes.
    The fc contraction (full E) runs in CH-row chunks to bound dequant
    temporaries; the output block (constant index map) accumulates across
    steps, initialized with bproj at t=0."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.broadcast_to(
            bp_ref[:].astype(jnp.float32), o_ref.shape)

    N = x_ref.shape[0]
    half_e = E // 2

    def fc_half(p_ref, s_ref):
        """x @ deq(fc tile) for one F-range column tile (full-E rows,
        CH-chunked; s_ref carries ALL E/32 scale rows of the tile)."""
        acc = jnp.zeros((N, block_fh), jnp.float32)
        magic = jnp.int32(0x4B000000)
        off = jnp.float32(8388608.0 + 8.0)
        for c in range(half_e // chunk):
            pch = p_ref[pl.ds(c * chunk, chunk), :].astype(jnp.int32)
            nbc = chunk // QK
            slo = s_ref[pl.ds(c * nbc, nbc), :].astype(jnp.float32)
            shi = s_ref[pl.ds(half_e // QK + c * nbc, nbc), :].astype(
                jnp.float32)
            sexp_lo = jnp.broadcast_to(
                slo[:, None, :], (nbc, QK, block_fh)).reshape(chunk, block_fh)
            sexp_hi = jnp.broadcast_to(
                shi[:, None, :], (nbc, QK, block_fh)).reshape(chunk, block_fh)
            # f32xf math (mantissa-OR, bias subtracted BEFORE the scale)
            flo = jax.lax.bitcast_convert_type(
                (pch & 0x0F) | magic, jnp.float32)
            fhi = jax.lax.bitcast_convert_type(
                (pch >> 4) | magic, jnp.float32)
            wlo = (flo - off) * sexp_lo
            whi = (fhi - off) * sexp_hi
            xlo = x_ref[:, pl.ds(c * chunk, chunk)].astype(jnp.float32)
            xhi = x_ref[:, pl.ds(half_e + c * chunk, chunk)].astype(
                jnp.float32)
            acc += jnp.dot(xlo, wlo, preferred_element_type=jnp.float32)
            acc += jnp.dot(xhi, whi, preferred_element_type=jnp.float32)
        return acc

    h_lo = fc_half(pfc_lo_ref, sfc_lo_ref)
    h_hi = fc_half(pfc_hi_ref, sfc_hi_ref)
    h_lo += bfc_lo_ref[:].astype(jnp.float32)
    h_hi += bfc_hi_ref[:].astype(jnp.float32)
    if act == "gelu_tanh":
        h_lo, h_hi = jax.nn.gelu(h_lo, approximate=True), \
            jax.nn.gelu(h_hi, approximate=True)
    elif act == "gelu_exact":
        h_lo, h_hi = _gelu_erf(h_lo), _gelu_erf(h_hi)
    elif act == "relu":
        h_lo, h_hi = jnp.maximum(h_lo, 0), jnp.maximum(h_hi, 0)
    else:
        raise NotImplementedError(act)

    # proj tile: packed rows [t*BFh, (t+1)*BFh) — lo nibbles multiply h_lo,
    # hi nibbles h_hi; both dequant chunked over rows
    acc_o = jnp.zeros(o_ref.shape, jnp.float32)
    magic = jnp.int32(0x4B000000)
    off = jnp.float32(8388608.0 + 8.0)
    for c in range(block_fh // chunk):
        pch = pp_ref[pl.ds(c * chunk, chunk), :].astype(jnp.int32)
        nbc = chunk // QK
        slo = sp_lo_ref[pl.ds(c * nbc, nbc), :].astype(jnp.float32)
        shi = sp_hi_ref[pl.ds(c * nbc, nbc), :].astype(jnp.float32)
        to = pch.shape[1]
        sexp_lo = jnp.broadcast_to(
            slo[:, None, :], (nbc, QK, to)).reshape(chunk, to)
        sexp_hi = jnp.broadcast_to(
            shi[:, None, :], (nbc, QK, to)).reshape(chunk, to)
        flo = jax.lax.bitcast_convert_type((pch & 0x0F) | magic, jnp.float32)
        fhi = jax.lax.bitcast_convert_type((pch >> 4) | magic, jnp.float32)
        wlo = (flo - off) * sexp_lo
        whi = (fhi - off) * sexp_hi
        acc_o += jnp.dot(h_lo[:, c * chunk:(c + 1) * chunk], wlo,
                         preferred_element_type=jnp.float32)
        acc_o += jnp.dot(h_hi[:, c * chunk:(c + 1) * chunk], whi,
                         preferred_element_type=jnp.float32)
    o_ref[:] += acc_o


@functools.partial(
    jax.jit,
    static_argnames=("block_fh", "chunk", "act", "interpret", "math"),
)
def _pallas_q4_mlp_ps_2d(
    x, pfc, sfc, pproj, sproj, bfc, bproj, *,
    block_fh: int, chunk: int, act: str, interpret: bool, math: str = "i32",
):
    N, E = x.shape
    F = pfc.shape[1]
    half_f = F // 2
    grid = (half_f // block_fh,)
    nbp = block_fh // QK  # proj scale rows per tile (per plane)

    return pl.pallas_call(
        functools.partial(_kernel_mlp_ps, math=math, act=act,
                          block_fh=block_fh, chunk=chunk, E=E, F=F),
        grid=grid,
        in_specs=[
            pl.BlockSpec((N, E), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),  # x resident
            # fc packed: lo/hi column tiles (full E rows)
            pl.BlockSpec((E // 2, block_fh), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E // 2, block_fh),
                         lambda t: (0, half_f // block_fh + t),
                         memory_space=pltpu.VMEM),
            # fc scales: lo/hi column tiles (full rows)
            pl.BlockSpec((E // QK, block_fh), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((E // QK, block_fh),
                         lambda t: (0, half_f // block_fh + t),
                         memory_space=pltpu.VMEM),
            # proj packed rows [t*BFh, (t+1)*BFh)
            pl.BlockSpec((block_fh, E), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            # proj scales: lo rows t*nbp.., hi rows F/64 + t*nbp..
            pl.BlockSpec((nbp, E), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nbp, E),
                         lambda t: (half_f // QK // nbp + t, 0),
                         memory_space=pltpu.VMEM),
            # biases: fc lo/hi column tiles + whole proj bias
            pl.BlockSpec((1, block_fh), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_fh),
                         lambda t: (0, half_f // block_fh + t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, E), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, E), lambda t: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, E), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(x, pfc, pfc, sfc, sfc, pproj, sproj, sproj, bfc, bfc, bproj)


def pallas_q4_mlp_ps(
    x: jnp.ndarray,  # [..., E]
    w_fc: Q4Tensor,  # ps, [F, E] logical
    b_fc,  # [F] or None
    w_proj: Q4Tensor,  # ps, [E, F] logical
    b_proj,  # [E] or None
    *,
    act: str = "gelu_tanh",
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused ``act(x @ w_fc.T + b_fc) @ w_proj.T + b_proj`` (decode shapes,
    N ≤ 8).  Arrays whose lo/hi tiles differ (fc packed/scales/bias, proj
    scales) are passed twice with different BlockSpec index maps."""
    assert w_fc.layout == "ps" and w_proj.layout == "ps"
    lead = x.shape[:-1]
    E = x.shape[-1]
    F = w_fc.out_features
    n = 1
    for d in lead:
        n *= d
    assert n <= 8, n
    block_fh = 512 if (F // 2) % 512 == 0 else 256
    # chunk 256: the per-chunk dequant temporaries (i32 widened + f32
    # planes) are the scoped-VMEM budget driver — chunk 512 measured 16.9 MB
    # against the 16 MB limit on GPT-J shapes
    chunk = 256 if (E // 2) % 256 == 0 else 128
    zf = jnp.zeros((F,), jnp.float32) if b_fc is None else b_fc
    zp = jnp.zeros((E,), jnp.float32) if b_proj is None else b_proj
    y = _pallas_q4_mlp_ps_2d(
        x.reshape(n, E), w_fc.packed, w_fc.scales, w_proj.packed,
        w_proj.scales, zf.astype(jnp.float32).reshape(1, F),
        zp.astype(jnp.float32).reshape(1, E),
        block_fh=block_fh, chunk=chunk, act=act, interpret=interpret,
        math=_DEQUANT_MATH,
    )
    return y.reshape(*lead, E)


def _pick_blocks_gi(half_k: int, O: int) -> Tuple[int, int]:
    """Geometry for the grouped-integer decode kernels (n <= 8).  Measured
    on the 4096x4096 B=1 shape (kernel_lab 2026-08-21): (4096, 256) streams
    934 GB/s — at the DMA ceiling — while (2048, 512) runs 385; short-K
    tiles keep the per-tile dequant latency low and WIDE o tiles make the
    DMA-minor bursts long.  block_o: largest divisor of O within ~1.25x of
    the 1M-element tile area (the slack admits 4608 for the padded 50688
    lm head instead of collapsing to 512-byte bursts)."""
    block_kh = 256  # caller guarantees half_k % 256 == 0
    cap = ((1 << 20) // block_kh) * 5 // 4
    best = 0
    d = 128  # lane-aligned divisors only (Mosaic: minor block % 128)
    while d <= min(O, cap):
        if O % d == 0 and d > best:
            best = d
        d += 128
    if best < 1024:  # no wide aligned divisor (e.g. O = 256*197): the
        return None  # wide-burst geometry doesn't exist — caller falls back
    return best, block_kh


def _pick_blocks(half_k: int, O: int, n: int) -> Tuple[int, int]:
    """VMEM-budget tile sizes.  Tile AREA stays at 1M elements (half that for
    n > 64): the dequant temporaries (i32 widened bytes + f32/bf16 planes)
    cost ~10x the packed tile bytes of scoped VMEM, so 2M-element tiles blow
    the 16 MB limit — and at n=128 the resident x/out blocks leave even
    less (1M-element tiles fail Mosaic allocation at B=128 decode).

    Decode (n ≤ 32): wide-o tiles.  The o axis is the DMA minor dim of the
    K-major weight, so block_o = burst length: [512, 2048] tiles stream 2 KB
    contiguous bursts (measured 715 GB/s on the 50432x4096 lm head) while
    the old tall [8192, 128] choice issued 128-byte strided bursts
    (measured 199 GB/s on the 16384→4096 proj).  The k-grid this creates
    re-DMAs only the tiny activation block per o step.

    Prefill (n > 32): prefer a K-grid of ONE — the x block's index map
    depends on the k step, so every extra k step re-DMAs the activations
    once per o step; at batch 32+ that re-stream is real traffic (measured
    319 GB/s vs 438 on equal-byte shapes).  Tall tiles shrink the k-grid
    without growing the area."""
    if n <= 32:
        area = 1 << 20
        block_o = min(O, 2048)
        while O % block_o:
            block_o //= 2
        # largest power-of-two divisor of half_k within the area budget
        # (a plain cap can be a non-divisor — e.g. gpt2's proj half_k=1536
        # with cap 1365 decayed the halving loop to block_kh=1 and a
        # zero-sized scales tile)
        cap = min(half_k, max(128, area // block_o))
        # start at the uint8 sublane tile (32) when divisibility allows:
        # sub-32 block_kh would produce sub-tile scales blocks.  Today the
        # matmul.py dispatch guard (K % 256 == 0) already guarantees the
        # doubling loop passes 32, but this keeps the invariant local
        # (ADVICE r2).
        block_kh = 32 if half_k % 32 == 0 else 16
        while block_kh * 2 <= cap and half_k % (block_kh * 2) == 0:
            block_kh *= 2
        return block_o, block_kh
    if n <= 128 and half_k % 256 == 0 and O % 1024 == 0:
        # batch decode (serving steps, B<=128): wide-o short-K tiles like
        # the gi geometry — the old tall [2048, 256] tiles issued 256-byte
        # strided bursts (~300 GB/s measured on the B=128 q4 groups, r4).
        # x stays resident ([128, K] bf16 <= 4 MB) so the k-grid re-streams
        # nothing; bf16 planes keep the dequant temporaries in budget.
        block_o = 2048
        while O % block_o:
            block_o //= 2
        return block_o, 256
    kh_cap = 2048
    block_kh = min(half_k, kh_cap)
    while half_k % block_kh:
        block_kh //= 2
    area = (1 << 20) if n <= 64 else (1 << 19)
    block_o = min(O, max(128, area // block_kh))
    while O % block_o:
        block_o //= 2
    return block_o, block_kh


def _kernel_stacked(il_ref, xe_ref, xo_ref, p_ref, s_ref, o_ref, *,
                    acc_dtype, math):
    """Stacked-layer variant: weight blocks carry a leading layer dim of 1,
    selected by the scalar-prefetched layer index (see
    pallas_q4_matmul_stacked)."""
    k_step = pl.program_id(1)

    @pl.when(k_step == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    xe, xo = xe_ref[:], xo_ref[:]
    wlo, whi = _dequant_planes(p_ref, s_ref, acc_dtype, stacked=True,
                               math=math)
    acc = jnp.dot(xe.astype(wlo.dtype), wlo,
                  preferred_element_type=jnp.float32)
    acc += jnp.dot(xo.astype(whi.dtype), whi,
                   preferred_element_type=jnp.float32)
    o_ref[:] += acc.astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_o", "block_kh", "acc_dtype", "interpret",
                     "math"),
)
def _pallas_q4_matmul_stacked_2d(
    il: jnp.ndarray,  # int32 [1]
    xe: jnp.ndarray,  # [N, K/2]
    xo: jnp.ndarray,  # [N, K/2]
    packed: jnp.ndarray,  # [L, K/2, O] uint8
    scales: jnp.ndarray,  # [L, K/32, O]
    *,
    block_o: int,
    block_kh: int,
    acc_dtype,
    interpret: bool,
    math: str = "i32",
) -> jnp.ndarray:
    N, half_k = xe.shape
    O = packed.shape[-1]
    nb_per_tile = block_kh // (QK // 2)
    grid = (pl.cdiv(O, block_o), pl.cdiv(half_k, block_kh))

    return pl.pallas_call(
        functools.partial(_kernel_stacked, acc_dtype=acc_dtype,
                          math=math),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((N, block_kh), lambda i, k, il: (0, k)),
                pl.BlockSpec((N, block_kh), lambda i, k, il: (0, k)),
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
        interpret=interpret,
    )(il, xe, xo, packed, scales)


def _planes_padded(x2: jnp.ndarray, n: int):
    """Even/odd element planes of [n, K] x, rows padded to the f32 sublane
    tile (8).  The strided slices fuse into x's producing op in XLA."""
    xe = x2[:, 0::2]
    xo = x2[:, 1::2]
    n_pad = max(8, -(-n // 8) * 8)
    if n_pad != n:
        pad = jnp.zeros((n_pad - n, x2.shape[1] // 2), x2.dtype)
        xe = jnp.concatenate([xe, pad], axis=0)
        xo = jnp.concatenate([xo, pad], axis=0)
    return xe, xo, n_pad


def pallas_q4_matmul_stacked(
    x: jnp.ndarray,
    w: Q4Tensor,  # stacked: packed [L, K/2, O]
    il: jnp.ndarray,  # int32 scalar layer index
    *,
    acc_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x [..., K] @ w[il].T → [..., O]`` selecting layer ``il`` of a stacked
    Q4 weight **inside the kernel** (scalar prefetch indexes HBM directly).

    This is the decode hot path: a ``lax.scan`` over layers that passed the
    stacked weights as scan inputs would materialize a dynamic-slice copy of
    every layer's weight each step — tripling HBM traffic (measured 256 GB/s
    vs ~400 GB/s with this kernel on GPT-J-6B).  The reference's analogue is
    staging weights into the accelerator arena once (xmax_cpyin, imax.c:2144)
    instead of re-copying per call."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    O = w.out_features
    n = 1
    for d in lead:
        n *= d
    xe, xo, n_pad = _planes_padded(x.reshape(n, K), n)
    block_o, block_kh = _pick_blocks(K // 2, O, n_pad)
    y = _pallas_q4_matmul_stacked_2d(
        jnp.asarray(il, jnp.int32).reshape(1), xe, xo, w.packed, w.scales,
        block_o=block_o, block_kh=block_kh,
        acc_dtype=acc_dtype, interpret=interpret, math=_DEQUANT_MATH,
    )
    return y[:n].reshape(*lead, O)


def pallas_q4_matmul(
    x: jnp.ndarray,
    w: Q4Tensor,
    *,
    acc_dtype=jnp.float32,
    interpret: bool = False,
) -> jnp.ndarray:
    """``x [..., K] @ w.T → [..., O]`` with w Q4_0, fused dequant in VMEM."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    O = w.out_features
    assert w.in_features == K, (w.shape, x.shape)

    n = 1
    for d in lead:
        n *= d
    xe, xo, n_pad = _planes_padded(x.reshape(n, K), n)
    block_o, block_kh = _pick_blocks(K // 2, O, n_pad)
    y = _pallas_q4_matmul_2d(
        xe, xo, w.packed, w.scales,
        block_o=block_o, block_kh=block_kh,
        acc_dtype=acc_dtype, interpret=interpret, math=_DEQUANT_MATH,
    )
    return y[:n].reshape(*lead, O)
