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

Requires S % ts == 0 (the engine's kv_len buckets are 128-multiples); H
rides the sublane dimension of the scale tiles.  The packed minor dim Dp
(D for int8, D/2 for int4) may be any sublane multiple — Mosaic lane-pads
sub-128 minor dims in VMEM, and the HBM read stays contiguous because the
block spans the cache's entire minor dim; measured correct and faster than
the einsum path for every zoo head dim {64, 80, 96, 128, 256} on both kv
dtypes (tools/attn_gate_probe.py, r5).  Callers gate on D % 16 (int4) /
D % 8 (int8) and fall back to the XLA einsum path (models/transformer.py).
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
    import os

    env = os.environ.get("VSIM_DECODE_KERNEL")  # A/B without code edits
    if env in ("on", "off"):
        return env == "on"
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
            knq_ref, kns_ref, vnq_ref, vns_ref,
            o_ref, m_ref, l_ref, acc_ref, *, scale, ts, alibi, packed4,
            fresh, split4):
    """``fresh=True`` (the deferred-write ragged decode path): the cache
    holds only rows < n_past — this step's OWN token arrives pre-quantized
    as knq/kns/vnq/vns [B, H, Dp]/[B, H] and is merged into the online
    softmax in the epilogue.  The caller then writes all layers' fresh rows
    with ONE batched scatter per step instead of one per layer (56 ragged
    scatters measured 8.5 ms/step at B=64 on GPT-J — the r3 serving wall;
    a single all-layer scatter is 0.12 ms)."""
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
        ks = ks_ref[0, 0].astype(jnp.float32)  # [H, ts]
        # dequant fused: scores[h, s] = scale * sum_d q[h,d] * kq[h,s,d]*ks
        # (scale the [H, ts] dot output by ks instead of the [H, ts, D]
        # operand — D× fewer multiplies).  The contraction runs on the MXU
        # as an H-batched matvec: the VPU mul+reduce form was the B=128
        # decode wall (kernel measured 168 GB/s ≈ 7 VPU ops per KV element;
        # r4) — the MXU does the 2 ops/elem of the dot for free.
        if split4:
            # Sub-128 packed minor dim (pythia-12b int4: Dp = 64): the
            # lane-axis concat in _unpack4 relayouts the whole [H, ts, 2Dp]
            # tile and ran at 125 GB/s vs 694 for the same shape at int8
            # (tools/attn_gate_probe.py r5).  Instead dot each nibble PLANE
            # against the matching static half of q — no big-array concat;
            # the two plane dots pad lanes Dp->128 on the MXU, which costs
            # the same passes as one 2Dp-wide dot.
            kp = kq_ref[0, 0].astype(jnp.int32)  # [H, ts, Dp]
            Dp = kp.shape[-1]  # noqa: N806
            klo = ((kp & 0x0F) - 8).astype(jnp.float32)
            khi = ((kp >> 4) - 8).astype(jnp.float32)
            dn = (((2,), (2,)), ((0,), (0,)))
            q_lo = jax.lax.slice_in_dim(q, 0, Dp, axis=1)[:, None, :]
            q_hi = jax.lax.slice_in_dim(q, Dp, 2 * Dp, axis=1)[:, None, :]
            s = (jax.lax.dot_general(
                    q_lo, klo, dn,
                    preferred_element_type=jnp.float32)[:, 0, :]
                 + jax.lax.dot_general(
                    q_hi, khi, dn,
                    preferred_element_type=jnp.float32)[:, 0, :]) \
                * ks * scale
        else:
            kq = (_unpack4(kq_ref[0, 0]) if packed4
                  else kq_ref[0, 0].astype(jnp.float32))  # [H, ts, D]
            s = jax.lax.dot_general(
                q[:, None, :], kq, (((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :] * ks * scale

        H = s.shape[0]  # noqa: N806
        s_idx = j * ts + jax.lax.broadcasted_iota(jnp.int32, (H, ts), 1)
        if alibi:
            s = s + sl_ref[:, 0:1] * s_idx.astype(jnp.float32)
        # fresh mode: the row at n_past is NOT yet in the cache — strictly
        # older rows only (the fresh token merges in the epilogue)
        if fresh:
            s = jnp.where(s_idx < n_past, s, _NEG_INF)
        else:
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

        vs = vs_ref[0, 0].astype(jnp.float32)  # [H, ts]
        if split4:
            pw = (p * vs)[:, None, :]
            vp = vq_ref[0, 0].astype(jnp.int32)  # [H, ts, Dp]
            vlo = ((vp & 0x0F) - 8).astype(jnp.float32)
            vhi = ((vp >> 4) - 8).astype(jnp.float32)
            dn = (((2,), (1,)), ((0,), (0,)))
            pv = jnp.concatenate([
                jax.lax.dot_general(
                    pw, vlo, dn,
                    preferred_element_type=jnp.float32)[:, 0, :],
                jax.lax.dot_general(
                    pw, vhi, dn,
                    preferred_element_type=jnp.float32)[:, 0, :],
            ], axis=-1)  # [H, D] — concat of SMALL per-step outputs only
        else:
            vq = (_unpack4(vq_ref[0, 0]) if packed4
                  else vq_ref[0, 0].astype(jnp.float32))  # [H, ts, D]
            pv = jax.lax.dot_general(
                (p * vs)[:, None, :], vq, (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)[:, 0, :]  # [H, D]
        acc_ref[:] = acc_ref[:] * alpha + pv

    # skip tiles fully beyond this sequence's horizon
    gate = (j * ts < n_past) if fresh else (j * ts <= n_past)
    pl.when(gate)(live)

    @pl.when(j == n_js - 1)
    def _():
        m = m_ref[:, 0:1]
        l = l_ref[:, 0:1]
        acc = acc_ref[:]
        if fresh:
            # merge this step's own token, dequantized through the SAME
            # round trip the cache write applies (bit-parity with the
            # write-then-attend order)
            # 2D unpack: the old [:, None, :] round trip through 3D is an
            # "unsupported shape cast" in Mosaic at sub-128 Dp (r5)
            kd = (_unpack4(knq_ref[0]) if packed4
                  else knq_ref[0].astype(jnp.float32))  # [H, D]
            kss = kns_ref[0].astype(jnp.float32)  # [H, 1]
            q = q_ref[0].astype(jnp.float32)
            s_new = (jnp.sum(q * kd, axis=-1, keepdims=True)
                     * kss * scale)  # [H, 1]
            if alibi:
                s_new = s_new + sl_ref[:, 0:1] * n_past.astype(jnp.float32)
            m2 = jnp.maximum(m, s_new)
            a = jnp.exp(m - m2)
            a = jnp.where(m == _NEG_INF, 0.0, a)
            p_new = jnp.exp(s_new - m2)
            l = a * l + p_new
            vd = (_unpack4(vnq_ref[0]) if packed4
                  else vnq_ref[0].astype(jnp.float32))
            vss = vns_ref[0].astype(jnp.float32)
            acc = acc * a + p_new * vss * vd
        inv = jnp.where(l > 0.0, 1.0 / jnp.where(l > 0.0, l, 1.0), 0.0)
        o_ref[0] = (acc * inv).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "kv_len", "block_s", "interpret", "alibi",
                     "fresh"),
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
    knq: jnp.ndarray,  # [B, H, Dp] fresh quantized rows (zeros unless fresh)
    kns: jnp.ndarray,  # [B, H]
    vnq: jnp.ndarray,
    vns: jnp.ndarray,
    *,
    scale: float,
    kv_len: int,
    block_s: int,
    interpret: bool,
    alibi: bool,
    fresh: bool,
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

    import os
    split4 = (packed4 and Dp < 128
              and not os.environ.get("VSIM_NO_SPLIT4"))  # A/B knob
    return pl.pallas_call(
        functools.partial(_kernel, scale=scale, ts=ts, alibi=alibi,
                          packed4=packed4, fresh=fresh, split4=split4),
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
                pl.BlockSpec((1, H, Dp), lambda b, j, il, np_: (b, 0, 0)),
                pl.BlockSpec((1, H, 1), lambda b, j, il, np_: (b, 0, 0)),
                pl.BlockSpec((1, H, Dp), lambda b, j, il, np_: (b, 0, 0)),
                pl.BlockSpec((1, H, 1), lambda b, j, il, np_: (b, 0, 0)),
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
    )(il, n_past, slopes, q, k_q, k_s, v_q, v_s, knq, kns, vnq, vns)


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
    fresh_rows=None,  # (knq [B,H,Dp], kns [B,H], vnq, vns): deferred-write
    # mode — the cache holds only rows < n_past; this step's own quantized
    # token merges in-kernel and the caller scatters it afterwards
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
    fresh = fresh_rows is not None
    if fresh:
        knq, kns, vnq, vns = fresh_rows
        kns = kns.reshape(B, H, 1)  # sublane-legal scale blocks (1, H, 1)
        vns = vns.reshape(B, H, 1)
    else:
        Dp = k_q.shape[4]  # noqa: N806
        knq = jnp.zeros((B, H, Dp), k_q.dtype)
        kns = jnp.zeros((B, H, 1), k_s.dtype)
        vnq, vns = knq, kns
    out = _decode_attn_call(
        jnp.asarray(il, jnp.int32).reshape(1), n_past, sl,
        q[:, 0].astype(jnp.bfloat16), k_q, k_s, v_q, v_s,
        knq, kns, vnq, vns,
        scale=float(scale), kv_len=kv_len, block_s=block_s,
        interpret=interpret, alibi=alibi, fresh=fresh,
    )
    return out[:, None]


def _writer_kernel(np_ref, knq_ref, kns_ref, vnq_ref, vns_ref,
                   kqw_ref, ksw_ref, vqw_ref, vsw_ref,
                   kqo_ref, kso_ref, vqo_ref, vso_ref, *, S, ts):
    """Insert one quantized row per (layer, batch) into the cache windows.
    Runs as an ALIASED pallas_call so XLA updates the cache in place — the
    equivalent jnp scatter after the per-layer kernel reads makes XLA copy
    the whole multi-GB cache every step (measured +25 ms int4 / +49 ms
    int8 at B=64, r4)."""
    b = pl.program_id(1)
    np_b = np_ref[b]
    valid = np_b < S
    r8 = np_b % 8
    i8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8, 1), 1)
    hit8 = jnp.logical_and(i8 == r8, valid)
    # rows arrive as [H, 1, Dp] blocks (5D operands): an in-kernel
    # [:, None, :] expand of a [H, Dp] block is an "unsupported shape cast"
    # in Mosaic at sub-128 Dp (pythia-12b int4, r5)
    kqo_ref[0, 0] = jnp.where(hit8, knq_ref[0, 0], kqw_ref[0, 0])
    vqo_ref[0, 0] = jnp.where(hit8, vnq_ref[0, 0], vqw_ref[0, 0])
    rts = np_b % ts
    its = jax.lax.broadcasted_iota(jnp.int32, (1, ts), 1)
    hit_ts = jnp.logical_and(its == rts, valid)
    kso_ref[0, 0] = jnp.where(hit_ts, kns_ref[0, 0], ksw_ref[0, 0])
    vso_ref[0, 0] = jnp.where(hit_ts, vns_ref[0, 0], vsw_ref[0, 0])


@functools.partial(jax.jit, donate_argnums=(1, 2, 3, 4),
                   static_argnames=("interpret",))
def _scatter_rows_call(n_past, k_q, k_s, v_q, v_s, knq, kns, vnq, vns,
                       *, interpret):
    L, B, H, S, Dp = k_q.shape
    ts = 128 if S % 128 == 0 else S

    def w8_ix(l, b, np_):
        return (l, b, 0, jnp.minimum(np_[b] // 8, S // 8 - 1), 0)

    def ws_ix(l, b, np_, ts=ts):
        return (l, b, 0, jnp.minimum(np_[b] // ts, S // ts - 1))

    row_ix = lambda l, b, np_: (l, b, 0, 0)  # noqa: E731
    row_ix5 = lambda l, b, np_: (l, b, 0, 0, 0)  # noqa: E731
    outs = pl.pallas_call(
        functools.partial(_writer_kernel, S=S, ts=ts),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # n_past
            grid=(L, B),
            in_specs=[
                pl.BlockSpec((1, 1, H, 1, Dp), row_ix5),
                pl.BlockSpec((1, 1, H, 1), row_ix),
                pl.BlockSpec((1, 1, H, 1, Dp), row_ix5),
                pl.BlockSpec((1, 1, H, 1), row_ix),
                pl.BlockSpec((1, 1, H, 8, Dp), w8_ix),
                pl.BlockSpec((1, 1, H, ts), ws_ix),
                pl.BlockSpec((1, 1, H, 8, Dp), w8_ix),
                pl.BlockSpec((1, 1, H, ts), ws_ix),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, H, 8, Dp), w8_ix),
                pl.BlockSpec((1, 1, H, ts), ws_ix),
                pl.BlockSpec((1, 1, H, 8, Dp), w8_ix),
                pl.BlockSpec((1, 1, H, ts), ws_ix),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct(k_q.shape, k_q.dtype),
            jax.ShapeDtypeStruct(k_s.shape, k_s.dtype),
            jax.ShapeDtypeStruct(v_q.shape, v_q.dtype),
            jax.ShapeDtypeStruct(v_s.shape, v_s.dtype),
        ],
        # operand order: n_past, knq, kns, vnq, vns, k_q, k_s, v_q, v_s
        # (indices include the scalar-prefetch operand)
        input_output_aliases={5: 0, 6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(n_past, knq.reshape(L, B, H, 1, Dp), kns,
      vnq.reshape(L, B, H, 1, Dp), vns, k_q, k_s, v_q, v_s)
    return outs


def scatter_rows_inplace(k_store, v_store, rows, n_past, *,
                         interpret: bool = False):
    """Write all layers' deferred quantized rows (kq [L,B,H,Dp], ks
    [L,B,H], vq, vs) at per-sequence slot ``n_past`` ([B]; >= S drops) —
    in place via kernel aliasing."""
    kq, ks, vq, vs = rows
    B, H = ks.shape[1:]
    k_q, k_s = k_store
    v_q, v_s = v_store
    kqn, ksn, vqn, vsn = _scatter_rows_call(
        jnp.asarray(n_past, jnp.int32), k_q, k_s, v_q, v_s,
        kq, ks.reshape(*ks.shape, 1), vq, vs.reshape(*vs.shape, 1),
        interpret=interpret)
    return (kqn, ksn), (vqn, vsn)


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
