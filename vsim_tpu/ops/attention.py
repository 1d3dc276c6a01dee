"""Blockwise (flash) attention — Pallas TPU kernels, forward + custom VJP.

The reference carries a FLASH_ATTN op (ggml_compute_forward_flash_attn_f32,
ggml.c:6867+) that its model drivers never call — vsim.cpp builds attention
as explicit KQ/scale/mask/softmax/KQV nodes over the full score matrix
(vsim.cpp:583-615).  This module is the TPU-native realization of that op,
done properly: online-softmax tiles that never materialize the [T, S] score
matrix, so prefill memory is O(T·D) instead of O(T·S) and long contexts
(SURVEY.md §5 "long-context story") stream K/V exactly once through VMEM.

Supports everything the model forward needs (models/transformer.py):
  * causal masking with a cache offset ``n_past`` (query t sees key s iff
    s <= n_past + t) — matching ggml_diag_mask_inf semantics (vsim.cpp:590)
  * ALiBi score bias ``slope_h * s`` for BLOOM (ggml ALIBI, ggml.c:6184+)
  * bf16 QKV with f32 online-softmax state and f32 MXU accumulation
  * a custom VJP (flash backward, recompute-from-lse) so the same kernel
    serves training and gradient-based calibration

Layout: q/k/v arrive [B, T, H, D] (the model's natural layout); the kernel
runs per (batch, head) over [T, D] tiles.  Grid = (B, H, T/tq, S/ts) with the
key axis innermost so the running (m, l, acc) state lives in VMEM scratch
across S steps.  Fully-masked tiles (causal horizon) are skipped in both the
forward and backward kernels — the causal triangle costs ~half the
full-rectangle FLOPs.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _scores(q_ref, k_ref, slopes_ref, h, n_past, i, j, tq, ts, *,
            scale, causal, alibi):
    """Masked, biased score tile s [tq, ts] in f32 (shared fwd/bwd)."""
    q = q_ref[0, 0].astype(jnp.float32)  # [tq, D]
    k = k_ref[0, 0].astype(jnp.float32)  # [ts, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    s_idx = j * ts + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
    if alibi:
        # slopes_ref is the whole [H, 1] array in SMEM; h from program_id(1)
        s = s + slopes_ref[h, 0] * s_idx.astype(jnp.float32)
    if causal:
        t_idx = n_past + i * tq + jax.lax.broadcasted_iota(
            jnp.int32, (tq, ts), 0)
        s = jnp.where(s_idx <= t_idx, s, _NEG_INF)
    return s


def _fwd_kernel(n_past_ref, slopes_ref, q_ref, k_ref, v_ref, o_ref, lse_ref,
                m_ref, l_ref, acc_ref, *, scale, causal, alibi, ts):
    j = pl.program_id(3)
    n_js = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_past = n_past_ref[0]
    h = pl.program_id(1)
    i = pl.program_id(2)
    tq = q_ref.shape[2]

    def live():
        s = _scores(q_ref, k_ref, slopes_ref, h, n_past, i, j, tq, ts,
                    scale=scale, causal=causal, alibi=alibi)
        m_prev = m_ref[:, 0:1]  # [tq, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # guard fully-masked rows (all -inf): exp(-inf - -inf) -> use 0
        p = jnp.exp(s - m_new)
        p = jnp.where(s == _NEG_INF, 0.0, p)
        alpha = jnp.exp(m_prev - m_new)
        alpha = jnp.where(m_prev == _NEG_INF, 0.0, alpha)

        l_ref[:, 0:1] = alpha * l_ref[:, 0:1] + jnp.sum(
            p, axis=-1, keepdims=True)
        m_ref[:, 0:1] = m_new
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [tq, D]
        acc_ref[:] = acc_ref[:] * alpha + pv

    if causal:
        # largest key index any query in this tile sees: n_past+(i+1)*tq-1
        horizon = n_past + (i + 1) * tq - 1
        pl.when(j * ts <= horizon)(live)
    else:
        live()

    @pl.when(j == n_js - 1)
    def _():
        l = l_ref[:, 0:1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0, 0] = (acc_ref[:] * inv).astype(o_ref.dtype)
        m = m_ref[:, 0:1]
        lse = jnp.where(l > 0.0, m + jnp.log(jnp.where(l > 0.0, l, 1.0)),
                        _NEG_INF)
        # lane-redundant [tq, 128] layout: per-row scalars are not a legal
        # TPU block shape, a broadcast row costs nothing extra in VMEM
        lse_ref[0, 0] = jnp.broadcast_to(lse, lse_ref.shape[2:])


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "alibi", "block_q", "block_s",
                     "interpret"),
)
def _flash_bhtd(
    n_past: jnp.ndarray,  # int32 [1]
    slopes: jnp.ndarray,  # f32 [H, 1] (zeros when not alibi)
    q: jnp.ndarray,  # [B, H, T, D]
    k: jnp.ndarray,  # [B, H, S, D]
    v: jnp.ndarray,  # [B, H, S, D]
    *,
    scale: float,
    causal: bool,
    alibi: bool,
    block_q: int,
    block_s: int,
    interpret: bool,
):
    """Returns (out [B,H,T,D], lse [B,H,T,128] f32, lane-redundant)."""
    B, H, T, D = q.shape
    S = k.shape[2]
    tq = min(block_q, T)
    ts = min(block_s, S)
    grid = (B, H, pl.cdiv(T, tq), pl.cdiv(S, ts))

    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, causal=causal,
                          alibi=alibi, ts=ts),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # slopes [H,1]
                pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, np_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, np_: (b, h, j, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, tq, 128), lambda b, h, i, j, np_: (b, h, i, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((tq, 128), jnp.float32),  # running max m
                pltpu.VMEM((tq, 128), jnp.float32),  # running denom l
                pltpu.VMEM((tq, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
            jax.ShapeDtypeStruct((B, H, T, 128), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(n_past, slopes, q, k, v)


# ---------------------------------------------------------------------------
# Backward (flash2-style: recompute p from q/k and the saved logsumexp)
# ---------------------------------------------------------------------------


def _probs(q_ref, k_ref, slopes_ref, lse_ref, h, n_past, i, j, tq, ts, *,
           scale, causal, alibi):
    s = _scores(q_ref, k_ref, slopes_ref, h, n_past, i, j, tq, ts,
                scale=scale, causal=causal, alibi=alibi)
    lse = lse_ref[0, 0][:, 0:1]  # [tq, 1] from the lane-redundant row
    p = jnp.exp(s - lse)
    # masked scores and fully-masked rows (lse == -inf) contribute 0
    p = jnp.where(s == _NEG_INF, 0.0, p)
    p = jnp.where(lse == _NEG_INF, 0.0, p)
    return p


def _bwd_dq_kernel(n_past_ref, slopes_ref, q_ref, k_ref, v_ref, do_ref,
                   lse_ref, dsum_ref, dq_ref, acc_ref, *,
                   scale, causal, alibi, ts):
    j = pl.program_id(3)
    n_js = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_past = n_past_ref[0]
    h = pl.program_id(1)
    i = pl.program_id(2)
    tq = q_ref.shape[2]

    def live():
        p = _probs(q_ref, k_ref, slopes_ref, lse_ref, h, n_past, i, j, tq,
                   ts, scale=scale, causal=causal, alibi=alibi)
        do = do_ref[0, 0].astype(jnp.float32)
        v = v_ref[0, 0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [tq, ts]
        dsum = dsum_ref[0, 0][:, 0:1]
        ds = p * (dp - dsum) * scale
        acc_ref[:] += jax.lax.dot_general(
            ds, k_ref[0, 0].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [tq, D]

    if causal:
        horizon = n_past + (i + 1) * tq - 1
        pl.when(j * ts <= horizon)(live)
    else:
        live()

    @pl.when(j == n_js - 1)
    def _():
        dq_ref[0, 0] = acc_ref[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(n_past_ref, slopes_ref, q_ref, k_ref, v_ref, do_ref,
                    lse_ref, dsum_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                    scale, causal, alibi, ts):
    i = pl.program_id(3)  # query-tile axis (innermost)
    n_is = pl.num_programs(3)

    @pl.when(i == 0)
    def _():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    n_past = n_past_ref[0]
    h = pl.program_id(1)
    j = pl.program_id(2)  # key-tile axis
    tq = q_ref.shape[2]

    def live():
        p = _probs(q_ref, k_ref, slopes_ref, lse_ref, h, n_past, i, j, tq,
                   ts, scale=scale, causal=causal, alibi=alibi)
        do = do_ref[0, 0].astype(jnp.float32)
        dv_acc[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [ts, D]
        dp = jax.lax.dot_general(
            do, v_ref[0, 0].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # [tq, ts]
        dsum = dsum_ref[0, 0][:, 0:1]
        ds = p * (dp - dsum) * scale
        dk_acc[:] += jax.lax.dot_general(
            ds, q_ref[0, 0].astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # [ts, D]

    if causal:
        # key tile j receives gradient only from query tiles that can see it
        horizon = n_past + (i + 1) * tq - 1
        pl.when(j * ts <= horizon)(live)
    else:
        live()

    @pl.when(i == n_is - 1)
    def _():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "alibi", "block_q", "block_s",
                     "interpret"),
)
def _flash_bwd_bhtd(n_past, slopes, q, k, v, do, lse, dsum, *,
                    scale, causal, alibi, block_q, block_s, interpret):
    B, H, T, D = q.shape
    S = k.shape[2]
    tq = min(block_q, T)
    ts = min(block_s, S)

    common = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # slopes [H,1]
    ]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, causal=causal,
                          alibi=alibi, ts=ts),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, pl.cdiv(T, tq), pl.cdiv(S, ts)),
            in_specs=common + [
                pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, np_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, np_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, tq, 128), lambda b, h, i, j, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, tq, 128), lambda b, h, i, j, np_: (b, h, i, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, tq, D), lambda b, h, i, j, np_: (b, h, i, 0)),
            scratch_shapes=[pltpu.VMEM((tq, D), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(n_past, slopes, q, k, v, do, lse, dsum)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, causal=causal,
                          alibi=alibi, ts=ts),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, pl.cdiv(S, ts), pl.cdiv(T, tq)),
            in_specs=common + [
                pl.BlockSpec((1, 1, tq, D), lambda b, h, j, i, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, j, i, np_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, j, i, np_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, tq, D), lambda b, h, j, i, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, tq, 128), lambda b, h, j, i, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, tq, 128), lambda b, h, j, i, np_: (b, h, i, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, 1, ts, D), lambda b, h, j, i, np_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, j, i, np_: (b, h, j, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((ts, D), jnp.float32),
                pltpu.VMEM((ts, D), jnp.float32),
            ],
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, H, S, D), k.dtype),
            jax.ShapeDtypeStruct((B, H, S, D), v.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(n_past, slopes, q, k, v, do, lse, dsum)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# custom_vjp wiring
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(statics, q, k, v, n_past, slopes):
    scale, causal, alibi, block_q, block_s, interpret = statics
    out, _ = _flash_bhtd(n_past, slopes, q, k, v, scale=scale, causal=causal,
                         alibi=alibi, block_q=block_q, block_s=block_s,
                         interpret=interpret)
    return out


def _flash_core_fwd(statics, q, k, v, n_past, slopes):
    scale, causal, alibi, block_q, block_s, interpret = statics
    out, lse = _flash_bhtd(n_past, slopes, q, k, v, scale=scale,
                           causal=causal, alibi=alibi, block_q=block_q,
                           block_s=block_s, interpret=interpret)
    return out, (q, k, v, out, lse, n_past, slopes)


def _flash_core_bwd(statics, res, g):
    scale, causal, alibi, block_q, block_s, interpret = statics
    q, k, v, out, lse, n_past, slopes = res
    # D_i = rowsum(dO * O) — the softmax-jacobian diagonal term
    # (lane-redundant [B,H,T,128] layout to match the kernels' block shape)
    dsum = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    dsum = jnp.broadcast_to(dsum[..., None], (*dsum.shape, 128))
    dq, dk, dv = _flash_bwd_bhtd(
        n_past, slopes, q, k, v, g.astype(q.dtype), lse, dsum,
        scale=scale, causal=causal, alibi=alibi, block_q=block_q,
        block_s=block_s, interpret=interpret)
    d_npast = np.zeros(n_past.shape, jax.dtypes.float0)  # int primal
    return dq, dk, dv, d_npast, jnp.zeros_like(slopes)


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k: jnp.ndarray,  # [B, S, H, D] (or [B, H, S, D] with kv_transposed)
    v: jnp.ndarray,  # like k
    *,
    n_past=0,  # int32 scalar cache offset
    scale: Optional[float] = None,
    causal: bool = True,
    slopes: Optional[jnp.ndarray] = None,  # [H] ALiBi slopes
    block_q: int = 256,
    block_s: int = 512,
    interpret: bool = False,
    kv_transposed: bool = False,
) -> jnp.ndarray:
    """Blockwise attention over already-roped q against the K/V prefix.

    Returns [B, T, H, D].  Equivalent to the masked-softmax einsum path in
    models/transformer.py:attention but without materializing [B, H, T, S].
    Differentiable (custom flash VJP) w.r.t. q, k, v.

    ``kv_transposed``: k/v already arrive head-major [B, H, S, D] — the KV
    cache's storage layout (models/transformer.py:init_cache) — skipping
    the S↔H relayout copy.
    """
    B, T, H, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    qt = jnp.swapaxes(q, 1, 2)  # [B, H, T, D]
    if kv_transposed:
        kt, vt = k, v
    else:
        kt = jnp.swapaxes(k, 1, 2)
        vt = jnp.swapaxes(v, 1, 2)
    if slopes is None:
        sl = jnp.zeros((H, 1), jnp.float32)
        alibi = False
    else:
        sl = jnp.asarray(slopes, jnp.float32).reshape(H, 1)
        alibi = True
    statics = (float(scale), causal, alibi, block_q, block_s, interpret)
    out = _flash_core(statics, qt, kt, vt,
                      jnp.asarray(n_past, jnp.int32).reshape(1), sl)
    return jnp.swapaxes(out, 1, 2)


def attention_reference(q, k, v, *, n_past=0, scale=None, causal=True,
                        slopes=None):
    """XLA oracle with materialized scores — the correctness baseline the
    kernel is tested against (mirrors models/transformer.py:attention)."""
    B, T, H, D = q.shape
    S = k.shape[1]
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    s_idx = jnp.arange(S, dtype=jnp.int32)
    if slopes is not None:
        s = s + jnp.asarray(slopes, jnp.float32)[None, :, None, None] \
            * s_idx.astype(jnp.float32)[None, None, None, :]
    if causal:
        t_idx = jnp.asarray(n_past, jnp.int32) + jnp.arange(T, dtype=jnp.int32)
        mask = s_idx[None, :] <= t_idx[:, None]
        s = jnp.where(mask[None, None, :, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return out.astype(q.dtype)
