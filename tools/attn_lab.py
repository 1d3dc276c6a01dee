#!/usr/bin/env python
"""Decode-attention variant lab — times a full L-layer, batch-B decode
attention pass per variant on the real TPU (chained differencing, like
tools/kernel_lab.py).

Variants:
  xla      — the einsum fallback path (_kv_read dequant + masked softmax)
  pallas   — ops/decode_attention.py production kernel (whatever it does now)
  vpu3d    — 3D-block kernel, VPU mult+lane-reduce scores (first attempt)
  mxu      — 3D-block kernel, per-head unrolled MXU dots
             (q[1,D]·K[ts,D]^T and p[1,ts]·V[ts,D], scales folded into the
             [1, ts] row — no transposes)

Usage: python tools/attn_lab.py [--batch 32] [--kv-len 128] [--model gpt-j-6b]
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

_NEG_INF = float(jnp.finfo(jnp.float32).min)


# ---------------------------------------------------------------------------
# variant kernels (share the production call signature)
# ---------------------------------------------------------------------------


def _k_vpu3d(il_ref, np_ref, sl_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
             o_ref, m_ref, l_ref, acc_ref, *, scale, ts):
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_js = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_past = np_ref[b]

    def live():
        q = q_ref[0].astype(jnp.float32)
        kq = kq_ref[0, 0].astype(jnp.float32)
        ks = ks_ref[0, 0].astype(jnp.float32)
        s = jnp.sum(q[:, None, :] * kq, axis=-1) * ks * scale
        H = s.shape[0]  # noqa: N806
        s_idx = j * ts + jax.lax.broadcasted_iota(jnp.int32, (H, ts), 1)
        s = jnp.where(s_idx <= n_past, s, _NEG_INF)
        m_prev = m_ref[:, 0:1]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        p = jnp.where(s == _NEG_INF, 0.0, p)
        alpha = jnp.exp(m_prev - m_new)
        alpha = jnp.where(m_prev == _NEG_INF, 0.0, alpha)
        l_ref[:, 0:1] = alpha * l_ref[:, 0:1] + jnp.sum(p, axis=-1,
                                                        keepdims=True)
        m_ref[:, 0:1] = m_new
        vq = vq_ref[0, 0].astype(jnp.float32)
        vs = vs_ref[0, 0].astype(jnp.float32)
        pv = jnp.sum((p * vs)[:, :, None] * vq, axis=1)
        acc_ref[:] = acc_ref[:] * alpha + pv

    pl.when(j * ts <= n_past)(live)

    @pl.when(j == n_js - 1)
    def _():
        l = l_ref[:, 0:1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0] = (acc_ref[:] * inv).astype(o_ref.dtype)


def _k_mxu(il_ref, np_ref, sl_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
           o_ref, m_ref, l_ref, acc_ref, *, scale, ts):
    """Per-head MXU dots, heads unrolled (H static).  All operands stay in
    natural layout; K/V dequant scales fold into the [1, ts] score/prob rows.
    State rows live at sublane h of the [H, 128]/[H, D] scratch."""
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_js = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    n_past = np_ref[b]
    H = q_ref.shape[1]  # noqa: N806

    def ks_row(h):
        return ks_ref[0, 0, h][None].astype(jnp.float32)  # [1, ts]

    def vs_row(h):
        return vs_ref[0, 0, h][None].astype(jnp.float32)

    def live():
        s_idx = j * ts + jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
        smask = s_idx <= n_past
        for h in range(H):
            q = q_ref[0, h][None].astype(jnp.bfloat16)  # [1, D]
            kq = kq_ref[0, 0, h].astype(jnp.bfloat16)  # [ts, D] (i8→bf16)
            s = jax.lax.dot_general(
                q, kq, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, ts]
            s = s * ks_row(h) * scale
            s = jnp.where(smask, s, _NEG_INF)
            m_prev = m_ref[h:h + 1, :][:, 0:1]  # [1, 1]
            m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            p = jnp.where(s == _NEG_INF, 0.0, p)
            alpha = jnp.exp(m_prev - m_new)
            alpha = jnp.where(m_prev == _NEG_INF, 0.0, alpha)
            l_prev = l_ref[h:h + 1, :][:, 0:1]
            l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
            l_ref[h:h + 1, :] = jnp.broadcast_to(l_new, (1, 128))
            m_ref[h:h + 1, :] = jnp.broadcast_to(m_new, (1, 128))
            pv = jax.lax.dot_general(
                (p * vs_row(h)).astype(jnp.bfloat16),
                vq_ref[0, 0, h].astype(jnp.bfloat16),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)  # [1, D]
            acc_ref[h:h + 1, :] = acc_ref[h:h + 1, :] * alpha + pv

    pl.when(j * ts <= n_past)(live)

    @pl.when(j == n_js - 1)
    def _():
        l = l_ref[:, 0:1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0] = (acc_ref[:] * inv).astype(o_ref.dtype)


KERNELS = {"vpu3d": _k_vpu3d, "mxu": _k_mxu}


@functools.partial(jax.jit,
                   static_argnames=("variant", "scale", "block_s"))
def variant_call(il, n_past, q, k_q, k_s, v_q, v_s, *, variant, scale,
                 block_s):
    B, H, D = q.shape
    S = k_q.shape[3]
    ts = min(block_s, S)
    grid = (B, pl.cdiv(S, ts))
    sl = jnp.zeros((H, 1), jnp.float32)
    return pl.pallas_call(
        functools.partial(KERNELS[variant], scale=scale, ts=ts),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=grid,
            in_specs=[
                pl.BlockSpec((H, 1), lambda b, j, il, np_: (0, 0)),
                pl.BlockSpec((1, H, D), lambda b, j, il, np_: (b, 0, 0)),
                pl.BlockSpec((1, 1, H, ts, D),
                             lambda b, j, il, np_: (il[0], b, 0, j, 0)),
                pl.BlockSpec((1, 1, H, ts),
                             lambda b, j, il, np_: (il[0], b, 0, j)),
                pl.BlockSpec((1, 1, H, ts, D),
                             lambda b, j, il, np_: (il[0], b, 0, j, 0)),
                pl.BlockSpec((1, 1, H, ts),
                             lambda b, j, il, np_: (il[0], b, 0, j)),
            ],
            out_specs=pl.BlockSpec((1, H, D), lambda b, j, il, np_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, 128), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(il, n_past, sl, q, k_q, k_s, v_q, v_s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--kv-len", type=int, default=128)
    ap.add_argument("--model", default="gpt-j-6b")
    ap.add_argument("--variants", default="xla,pallas,vpu3d,mxu")
    args = ap.parse_args()

    from vsim_tpu.models.config import PRESETS
    from vsim_tpu.models.transformer import _kv_read, init_cache

    cfg = PRESETS[args.model].replace(n_ctx=512, kv_dtype="int8")
    L, H, D = cfg.n_layer, cfg.n_head, cfg.head_dim
    B, S = args.batch, args.kv_len
    print(f"{args.model} L={L} H={H} D={D} B={B} kv_len={S}", flush=True)

    # allocate the cache at kv_len, not n_ctx: at B=64 a full 512-ctx GPT-J
    # cache is 7.5 GB and, with the sliced copies below, OOMs the 16 GB chip
    cache = init_cache(cfg, B, n_ctx=S)
    # fill with noise so softmax is non-degenerate
    rng = np.random.default_rng(0)
    kq = jnp.asarray(rng.integers(-127, 127, cache["k"][0].shape, np.int8))
    ks = jnp.asarray(0.01 + rng.random(cache["k"][1].shape, np.float32) * 0.1,
                     jnp.bfloat16)
    k_store = (kq, ks)
    v_store = (jnp.asarray(
        rng.integers(-127, 127, cache["v"][0].shape, np.int8)),
        jnp.asarray(0.01 + rng.random(cache["v"][1].shape, np.float32) * 0.1,
                    jnp.bfloat16))
    kv_bytes = 2 * L * B * S * H * D

    q0 = jnp.asarray(rng.standard_normal((B, H, D)), jnp.bfloat16)
    n_past = jnp.full((B,), S - 2, jnp.int32)
    scale = float(D) ** -0.5

    def slice_len(a, axis):
        return jax.lax.slice_in_dim(a, 0, S, axis=axis)

    kqS = slice_len(k_store[0], 3)
    ksS = slice_len(k_store[1], 3)
    vqS = slice_len(v_store[0], 3)
    vsS = slice_len(v_store[1], 3)

    def xla_step(q, kq_, ks_, vq_, vs_):
        def body(c, _):
            q, il = c
            keys = _kv_read((kq_, ks_), il, None, jnp.bfloat16)
            values = _kv_read((vq_, vs_), il, None, jnp.bfloat16)
            s = jnp.einsum("bhd,bhsd->bhs", q, keys,
                           preferred_element_type=jnp.float32) * scale
            s_idx = jnp.arange(S, dtype=jnp.int32)
            s = jnp.where(s_idx[None, None, :] <= n_past[:, None, None], s,
                          _NEG_INF)
            p = jax.nn.softmax(s, axis=-1).astype(jnp.bfloat16)
            ctx = jnp.einsum("bhs,bhsd->bhd", p, values,
                             preferred_element_type=jnp.float32)
            return (ctx.astype(jnp.bfloat16), il + 1), None

        (q, _), _ = jax.lax.scan(body, (q, jnp.int32(0)), None, length=L)
        return q

    def pallas_step(q, kq_, ks_, vq_, vs_):
        from vsim_tpu.ops.decode_attention import decode_attention_int8

        def body(c, _):
            q, il = c
            ctx = decode_attention_int8(
                q[:, None], (kq_, ks_), (vq_, vs_), il, n_past,
                kv_len=S, scale=scale)
            return (ctx[:, 0].astype(jnp.bfloat16), il + 1), None

        (q, _), _ = jax.lax.scan(body, (q, jnp.int32(0)), None, length=L)
        return q

    def make_variant_step(v):
        def step(q, kq_, ks_, vq_, vs_):
            def body(c, _):
                q, il = c
                ctx = variant_call(
                    il.reshape(1), n_past, q, kq_, ks_, vq_, vs_,
                    variant=v, scale=scale, block_s=min(128, S))
                return (ctx.astype(jnp.bfloat16), il + 1), None

            (q, _), _ = jax.lax.scan(body, (q, jnp.int32(0)), None, length=L)
            return q

        return step

    steps = {"xla": xla_step, "pallas": pallas_step}
    for v in KERNELS:
        steps[v] = make_variant_step(v)

    def chain_time(step, reps=6, n_short=2, n_long=8):
        # the KV stores ride as explicit jit arguments — a closure would
        # bake gigabytes of cache into the executable as constants and ship
        # them through the remote-compile path (observed: multi-minute hangs)
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(q, kq_, ks_, vq_, vs_, n):
            def body(c, _):
                out = step(c, kq_, ks_, vq_, vs_)
                return out * 1e-3 + q * 0.0, None

            c, _ = jax.lax.scan(body, q, None, length=n)
            return c

        def run(n):
            float(jnp.sum(loop(q0, kqS, ksS, vqS, vsS,
                               n=n).astype(jnp.float32)))

        run(n_short)
        run(n_long)

        def t(n):
            ts_ = []
            for _ in range(reps):
                t0 = time.perf_counter()
                run(n)
                ts_.append(time.perf_counter() - t0)
            return float(np.median(ts_))

        return max((t(n_long) - t(n_short)) / (n_long - n_short), 1e-9)

    for name in args.variants.split(","):
        try:
            sec = chain_time(steps[name])
            print(f"{name:8s} {sec*1e3:8.3f} ms  "
                  f"{kv_bytes/sec/1e9:7.1f} GB/s on KV", flush=True)
        except Exception as e:
            print(f"{name:8s} FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
