"""Fused decode attention — single-token attention over the int8 KV cache.

The decode-step attention is the second HBM wall after the Q4 weights
(tools/decode_profile.py measured the unfused XLA path at ~120 GB/s on KV
reads vs ~800 possible: the int8 dequant materializes, and the per-layer
cache slice is copied).  This kernel reads the **whole stacked cache**
``[L, B, H, S, D]`` directly from HBM — the layer index arrives by scalar
prefetch exactly like the stacked Q4 weight kernel (ops/pallas_q4.py) — and
does dequant → scores → online-softmax → value accumulation in one VMEM
pass.  KV bytes are streamed exactly once per step.

Reference analogue: the reference walks the whole f32 cache through
KQ/softmax/KQV graph nodes every token (vsim.cpp:573-615); this is that
chain collapsed into one bandwidth-bound kernel.

Shapes (decode: T == 1):
  q        [B, H, D]     bf16 (already roped)
  k_q/v_q  [L, B, H, S, D] int8
  k_s/v_s  [L, B, H, S]  bf16 per-(token, head) scales
  n_past   [B] int32     per-sequence valid length (ragged serving ok)
  out      [B, H, D]     f32

Grid = (B, S/ts), key tiles innermost; running (m, l, acc) state lives in
VMEM scratch across the S walk.  Tiles fully beyond every sequence's
horizon are skipped (same trick as ops/attention.py).

Requires D % 128 == 0 and S % ts == 0 (the engine's kv_len buckets are
128-multiples); H rides the sublane dimension of the scale tiles.  Callers
gate on these and fall back to the XLA einsum path (models/transformer.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)

# kernel gate: "auto" = TPU only (interpret mode is too slow for routine CPU
# tests), "on" = always (CPU tests force it to exercise the integration),
# "off" = einsum fallback everywhere.
_MODE = "auto"


def set_decode_kernel(mode: str) -> None:
    global _MODE
    assert mode in ("auto", "on", "off")
    _MODE = mode


def decode_kernel_enabled() -> bool:
    if _MODE == "on":
        return True
    if _MODE == "off":
        return False
    return jax.default_backend() == "tpu"


def _unpack4(p):
    """Plane-packed int4 tile [.., ts, Dp] uint8 → [.., ts, 2*Dp] f32: low
    nibbles are dims [0, Dp), high nibbles [Dp, 2*Dp) — a lane-axis concat in
    natural dim order, no interleave (see transformer._kv_quantize4)."""
    p = p.astype(jnp.int32)
    return jnp.concatenate([(p & 0x0F) - 8, (p >> 4) - 8],
                           axis=-1).astype(jnp.float32)


def _kernel(il_ref, np_ref, sl_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref,
            o_ref, m_ref, l_ref, acc_ref, *, scale, ts, alibi, packed4):
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
        q = q_ref[0].astype(jnp.float32)  # [H, D]
        kq = (_unpack4(kq_ref[0, 0]) if packed4
              else kq_ref[0, 0].astype(jnp.float32))  # [H, ts, D]
        ks = ks_ref[0, 0].astype(jnp.float32)  # [H, ts]
        # dequant fused: scores[h, s] = scale * sum_d q[h,d] * kq[h,s,d]*ks
        # (scale the [H, ts] dot output by ks instead of the [H, ts, D]
        # operand — D× fewer multiplies)
        s = jnp.sum(q[:, None, :] * kq, axis=-1) * ks * scale  # [H, ts]

        H = s.shape[0]  # noqa: N806
        s_idx = j * ts + jax.lax.broadcasted_iota(jnp.int32, (H, ts), 1)
        if alibi:
            s = s + sl_ref[:, 0:1] * s_idx.astype(jnp.float32)
        s = jnp.where(s_idx <= n_past, s, _NEG_INF)

        m_prev = m_ref[:, 0:1]  # [H, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        p = jnp.where(s == _NEG_INF, 0.0, p)
        alpha = jnp.exp(m_prev - m_new)
        alpha = jnp.where(m_prev == _NEG_INF, 0.0, alpha)

        l_ref[:, 0:1] = alpha * l_ref[:, 0:1] + jnp.sum(p, axis=-1,
                                                        keepdims=True)
        m_ref[:, 0:1] = m_new

        vq = (_unpack4(vq_ref[0, 0]) if packed4
              else vq_ref[0, 0].astype(jnp.float32))  # [H, ts, D]
        vs = vs_ref[0, 0].astype(jnp.float32)  # [H, ts]
        pv = jnp.sum((p * vs)[:, :, None] * vq, axis=1)  # [H, D]
        acc_ref[:] = acc_ref[:] * alpha + pv

    # skip tiles fully beyond this sequence's horizon
    pl.when(j * ts <= n_past)(live)

    @pl.when(j == n_js - 1)
    def _():
        l = l_ref[:, 0:1]
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0] = (acc_ref[:] * inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "kv_len", "block_s", "interpret", "alibi"),
)
def _decode_attn_call(
    il: jnp.ndarray,  # int32 [1]
    n_past: jnp.ndarray,  # int32 [B]
    slopes: jnp.ndarray,  # f32 [H, 1] (zeros when not alibi)
    q: jnp.ndarray,  # [B, H, D] bf16
    k_q: jnp.ndarray,  # [L, B, H, S, Dp] int8 (Dp=D) or plane-packed uint8 (Dp=D/2)
    k_s: jnp.ndarray,  # [L, B, H, S]
    v_q: jnp.ndarray,
    v_s: jnp.ndarray,
    *,
    scale: float,
    kv_len: int,
    block_s: int,
    interpret: bool,
    alibi: bool,
):
    B, H, D = q.shape
    S = k_q.shape[3]
    Dp = k_q.shape[4]  # noqa: N806 — packed minor dim (D/2 for int4)
    packed4 = k_q.dtype == jnp.uint8
    # bound the S-walk by the static kv_len bucket via the GRID, not by
    # slicing the operands: pallas_call operands are materialized buffers,
    # so a lax.slice of the stacked [L,B,H,S,D] cache would copy the whole
    # sliced cache (all layers!) on every per-layer call — measured as
    # ~79 ms/step of pure copy at B=32 on GPT-J-6B.  Tiles past kv_len are
    # simply never visited.
    S_eff = min(kv_len, S) if kv_len is not None else S
    ts = min(block_s, S_eff)
    grid = (B, pl.cdiv(S_eff, ts))

    # Per-sequence KV streaming: clamp the tile index at each sequence's own
    # horizon, so grid steps past it re-request the SAME block — Pallas skips
    # the re-fetch when the block index is unchanged, and the `live` gate in
    # the kernel skips the compute.  Net effect: each sequence's KV HBM
    # traffic is proportional to its own n_past, not to the batch-wide
    # kv_len bucket (one long sequence no longer makes every short one
    # stream the full bucket — VERDICT r1 weak #5).
    def kv_ix(b, j, il, np_):
        jc = jnp.minimum(j, np_[b] // ts)
        return (il[0], b, 0, jc, 0)

    def ks_ix(b, j, il, np_):
        jc = jnp.minimum(j, np_[b] // ts)
        return (il[0], b, 0, jc)

    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, ts=ts, alibi=alibi,
                          packed4=packed4),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,  # il, n_past
            grid=grid,
            in_specs=[
                pl.BlockSpec((H, 1), lambda b, j, il, np_: (0, 0)),
                pl.BlockSpec((1, H, D), lambda b, j, il, np_: (b, 0, 0)),
                pl.BlockSpec((1, 1, H, ts, Dp), kv_ix),
                pl.BlockSpec((1, 1, H, ts), ks_ix),
                pl.BlockSpec((1, 1, H, ts, Dp), kv_ix),
                pl.BlockSpec((1, 1, H, ts), ks_ix),
            ],
            out_specs=pl.BlockSpec((1, H, D), lambda b, j, il, np_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 128), jnp.float32),  # running max
                pltpu.VMEM((H, 128), jnp.float32),  # running denom
                pltpu.VMEM((H, D), jnp.float32),  # ctx accumulator
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(il, n_past, slopes, q, k_q, k_s, v_q, v_s)


def decode_attention_int8(
    q: jnp.ndarray,  # [B, 1, H, D]
    k_store,  # (values int8 [L,B,H,S,D], scales [L,B,H,S])
    v_store,
    il: jnp.ndarray,  # int32 scalar layer index
    n_past: jnp.ndarray,  # int32 scalar or [B]
    *,
    kv_len: int,  # static attended-prefix bucket (S' <= S, 128-multiple)
    scale: float,
    slopes=None,  # [H] ALiBi slopes or None
    block_s: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Single-token fused attention over the stacked quantized KV cache
    (int8, or plane-packed int4 when the values side is uint8 — see
    transformer._kv_quantize4).

    Returns ctx [B, 1, H, D] f32.  Numerics match the einsum path of
    models/transformer.py:attention (same dequant, mask, softmax) —
    tests/test_decode_attention.py proves it against that oracle."""
    B, T, H, D = q.shape
    assert T == 1, "decode kernel is single-token; prefill uses flash/einsum"
    k_q, k_s = k_store
    v_q, v_s = v_store

    n_past = jnp.asarray(n_past, jnp.int32)
    if n_past.ndim == 0:
        n_past = jnp.broadcast_to(n_past[None], (B,))
    alibi = slopes is not None
    sl = (jnp.asarray(slopes, jnp.float32).reshape(H, 1) if alibi
          else jnp.zeros((H, 1), jnp.float32))
    out = _decode_attn_call(
        jnp.asarray(il, jnp.int32).reshape(1), n_past, sl,
        q[:, 0].astype(jnp.bfloat16), k_q, k_s, v_q, v_s,
        scale=float(scale), kv_len=kv_len, block_s=block_s,
        interpret=interpret, alibi=alibi,
    )
    return out[:, None]


def decode_attention_oracle(q, k_store, v_store, il, n_past, *, kv_len,
                            scale, slopes=None):
    """XLA reference (the einsum path, materialized scores) for tests."""
    from vsim_tpu.models.transformer import _kv_read

    B, T, H, D = q.shape
    keys = _kv_read(k_store, jnp.asarray(il, jnp.int32), kv_len, jnp.float32)
    values = _kv_read(v_store, jnp.asarray(il, jnp.int32), kv_len,
                      jnp.float32)
    S = keys.shape[2]
    s = jnp.einsum("bthd,bhsd->bhts", q.astype(jnp.float32), keys) * scale
    s_idx = jnp.arange(S, dtype=jnp.int32)
    if slopes is not None:
        s = s + jnp.asarray(slopes, jnp.float32)[None, :, None, None] \
            * s_idx.astype(jnp.float32)[None, None, None, :]
    n_past = jnp.asarray(n_past, jnp.int32)
    if n_past.ndim == 0:
        n_past = jnp.broadcast_to(n_past[None], (B,))
    mask = s_idx[None, :] <= n_past[:, None]  # [B, S]
    s = jnp.where(mask[:, None, None, :], s, _NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhts,bhsd->bthd", p, values)
