"""Blockwise (flash) attention — Pallas TPU kernel.

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

Layout: q/k/v arrive [B, T, H, D] (the model's natural layout); the kernel
runs per (batch, head) over [T, D] tiles.  Grid = (B, H, T/tq, S/ts) with the
key axis innermost so the running (m, l, acc) state lives in VMEM scratch
across S steps.  Fully-masked key tiles (tile start beyond the causal
horizon) are skipped with @pl.when — the causal lower triangle costs ~half
the full-rectangle FLOPs, like any production flash kernel.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def _kernel(n_past_ref, slopes_ref, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref, *, scale, causal, alibi, ts):
    j = pl.program_id(3)
    n_js = pl.num_programs(3)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_past = n_past_ref[0]
    i = pl.program_id(2)
    tq = q_ref.shape[2]

    # causal horizon: the largest key index any query in this tile can see is
    # n_past + (i+1)*tq - 1 — key tiles starting beyond it are all-masked
    def live():
        q = q_ref[0, 0].astype(jnp.float32)  # [tq, D]
        k = k_ref[0, 0].astype(jnp.float32)  # [ts, D]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [tq, ts]

        s_idx = j * ts + jax.lax.broadcasted_iota(jnp.int32, (tq, ts), 1)
        if alibi:
            # slopes_ref block is (1, 1), pre-selected to this head by the
            # BlockSpec index_map
            s = s + slopes_ref[0, 0] * s_idx.astype(jnp.float32)
        if causal:
            t_idx = n_past + i * tq + jax.lax.broadcasted_iota(
                jnp.int32, (tq, ts), 0)
            s = jnp.where(s_idx <= t_idx, s, _NEG_INF)

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
        horizon = n_past + (i + 1) * tq - 1
        pl.when(j * ts <= horizon)(live)
    else:
        live()

    @pl.when(j == n_js - 1)
    def _():
        l = l_ref[:, 0:1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0, 0] = (acc_ref[:] * inv).astype(o_ref.dtype)


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
) -> jnp.ndarray:
    B, H, T, D = q.shape
    S = k.shape[2]
    tq = min(block_q, T)
    ts = min(block_s, S)
    grid = (B, H, pl.cdiv(T, tq), pl.cdiv(S, ts))

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, causal=causal, alibi=alibi,
                          ts=ts),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1), lambda b, h, i, j, np_: (h, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1, tq, D), lambda b, h, i, j, np_: (b, h, i, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, np_: (b, h, j, 0)),
                pl.BlockSpec((1, 1, ts, D), lambda b, h, i, j, np_: (b, h, j, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, tq, D), lambda b, h, i, j, np_: (b, h, i, 0)),
            scratch_shapes=[
                pltpu.VMEM((tq, 128), jnp.float32),  # running max m
                pltpu.VMEM((tq, 128), jnp.float32),  # running denom l
                pltpu.VMEM((tq, D), jnp.float32),  # output accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, T, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary"),
        ),
        interpret=interpret,
    )(n_past, slopes, q, k, v)


def flash_attention(
    q: jnp.ndarray,  # [B, T, H, D]
    k: jnp.ndarray,  # [B, S, H, D]
    v: jnp.ndarray,  # [B, S, H, D]
    *,
    n_past=0,  # int32 scalar cache offset
    scale: Optional[float] = None,
    causal: bool = True,
    slopes: Optional[jnp.ndarray] = None,  # [H] ALiBi slopes
    block_q: int = 256,
    block_s: int = 512,
    interpret: bool = False,
) -> jnp.ndarray:
    """Blockwise attention over already-roped q against the K/V prefix.

    Returns [B, T, H, D].  Equivalent to the masked-softmax einsum path in
    models/transformer.py:attention but without materializing [B, H, T, S].
    """
    B, T, H, D = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(D)
    qt = jnp.swapaxes(q, 1, 2)  # [B, H, T, D]
    kt = jnp.swapaxes(k, 1, 2)
    vt = jnp.swapaxes(v, 1, 2)
    if slopes is None:
        sl = jnp.zeros((H, 1), jnp.float32)
        alibi = False
    else:
        sl = jnp.asarray(slopes, jnp.float32).reshape(H, 1)
        alibi = True
    out = _flash_bhtd(
        jnp.asarray(n_past, jnp.int32).reshape(1), sl, qt, kt, vt,
        scale=float(scale), causal=causal, alibi=alibi,
        block_q=block_q, block_s=block_s, interpret=interpret,
    )
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
