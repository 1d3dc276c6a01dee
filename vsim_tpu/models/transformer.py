"""Unified decoder forward pass for all four reference architectures.

This replaces the reference's per-arch C++ graph builders (gptneox_eval,
vsim.cpp:470-747, plus the GPT-J/BLOOM/GPT-2 drivers upstream Cformers had)
with one functional, jit-traceable forward over a pytree of parameters.
Layers are stacked along a leading axis and executed with ``lax.scan`` so a
40-layer model traces once, not 40 times.

Design deltas vs the reference (deliberate, SURVEY.md §5/§7):
  * K is roped once at cache-insert time; the reference re-ropes the whole
    cache every step (vsim.cpp:573-580).
  * KV cache dtype is configurable (bf16 default in the engine); reference
    uses f32 (vsim.cpp:349-366).
  * attention runs as one batched einsum over the MXU instead of per-head
    permute/mul_mat chains.

Parameter pytree layout (all per-layer arrays stacked on axis 0):
  params = {
    "wte": Q4Tensor|[V,E],  "wpe": [n_ctx,E] (gpt2),
    "emb_ln_w"/"emb_ln_b": [E] (bloom),
    "layers": {"ln1_w","ln1_b","ln2_w","ln2_b": [L,E],
               "wq","wk","wv","wo": Q4Tensor|[L,E,E],
               "bq","bk","bv","bo": [L,E],
               "w_fc": [L,F,E], "b_fc": [L,F],
               "w_proj": [L,E,F], "b_proj": [L,E]},
    "ln_f_w","ln_f_b": [E],
    "lm_head": Q4Tensor|[V,E], "lm_head_b": [V] (gptj),
  }
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.ops.layers import get_activation, layer_norm
from vsim_tpu.ops.matmul import Q4Layer, q4_matmul
from vsim_tpu.ops.rope import apply_rope
from vsim_tpu.parallel.context import constrain
from vsim_tpu.quant.q4 import Q4Tensor, q4_take_rows

Params = Dict[str, Any]


def alibi_slopes(n_head: int) -> jnp.ndarray:
    """ALiBi head slopes, HF BLOOM build_alibi_tensor semantics (reference:
    ggml ALIBI op used by the BLOOM driver upstream, ggml.c:6184+)."""
    cp2 = 2 ** math.floor(math.log2(n_head))
    base = 2.0 ** (-(2.0 ** -(math.log2(cp2) - 3)))
    slopes = [base ** i for i in range(1, cp2 + 1)]
    if cp2 != n_head:
        extra_base = 2.0 ** (-(2.0 ** -(math.log2(2 * cp2) - 3)))
        slopes += [extra_base ** i for i in range(1, 2 * (n_head - cp2) + 1, 2)]
    return jnp.asarray(slopes, dtype=jnp.float32)


def _kv_quantize(new: jnp.ndarray, scale_dtype):
    """Per-(token, head) symmetric int8 quantization of a [B, H, T, D] slice:
    q = round(x / s), s = amax_D / 127.  Returns (int8 values, scales [B,H,T]).
    Halves decode-step KV HBM traffic vs bf16 at ~1e-3 relative error — a
    deliberate upgrade over the reference's always-f32 cache (vsim.cpp:349)."""
    a = new.astype(jnp.float32)
    s = jnp.max(jnp.abs(a), axis=-1) / 127.0  # [B, H, T]
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = jnp.clip(jnp.round(a * inv[..., None]), -127, 127).astype(jnp.int8)
    return q, s.astype(scale_dtype)


def _kv_quantize4(new: jnp.ndarray, scale_dtype):
    """Per-(token, head) symmetric int4 quantization, plane-packed along D
    (Q4_0 math at group size D: s = amax/7, offset-8 nibbles — same formula
    family as the weight format, ggml.c:229-240).  Byte c of the packed
    [B, H, T, D/2] output holds dims c (low nibble) and c + D/2 (high) so
    dequant is two nibble planes **concatenated along lanes** in natural dim
    order — no cross-lane interleave anywhere.  Quarter the KV HBM bytes of
    bf16: lifts the max decode batch a 16 GB chip can hold (the aggregate-
    throughput lever) at ~2% attention-output RMS error."""
    a = new.astype(jnp.float32)
    s = jnp.max(jnp.abs(a), axis=-1) / 7.0  # [B, H, T]
    inv = jnp.where(s > 0, 1.0 / jnp.where(s > 0, s, 1.0), 0.0)
    q = (jnp.clip(jnp.round(a * inv[..., None]), -7, 7).astype(jnp.int32) + 8)
    D = q.shape[-1]  # noqa: N806
    packed = q[..., : D // 2] | (q[..., D // 2:] << 4)
    return packed.astype(jnp.uint8), s.astype(scale_dtype)


def _is_packed4(store) -> bool:
    """int4 cache marker: the values side of the pair is plane-packed uint8
    (int8 caches store int8 values)."""
    return isinstance(store, tuple) and store[0].dtype == jnp.uint8


def _kv_write(store, new, il, n_past, ragged, B, T):
    """Insert a [B, T, H, D] slice into the stacked cache at layer il,
    offset n_past (scalar, or [B] for ragged continuous batching).
    ``store`` is either a plain array [L, B, H, S, D] or an int8 pair
    ``(values int8 [L,B,H,S,D], scales [L,B,H,S])``.

    The cache is **head-major** ([.., H, S, D], not the write-natural
    [.., S, H, D]) so the attention reads — the decode hot path, streamed
    every step — are contiguous per (batch, head) and the score/value
    einsums need no S↔H transposes; only the tiny new [B,T,H,D] slice is
    transposed at insert."""
    int8_kv = isinstance(store, tuple)
    new = jnp.swapaxes(new, 1, 2)  # [B, H, T, D]
    if int8_kv:
        vals, scales = store
        quantize = _kv_quantize4 if _is_packed4(store) else _kv_quantize
        new_q, new_s = quantize(new, scales.dtype)
    zero = jnp.int32(0)
    if ragged:
        S_tot = (store[0] if int8_kv else store).shape[3]  # noqa: N806
        H = new.shape[1]  # noqa: N806
        b_ix = jnp.arange(B, dtype=jnp.int32)[:, None, None]  # [B,1,1]
        h_ix = jnp.arange(H, dtype=jnp.int32)[None, :, None]  # [1,H,1]
        s_dst = n_past[:, None, None] \
            + jnp.arange(T, dtype=jnp.int32)[None, None, :]  # [B,1,T]
        # NO clip: out-of-range rows are DROPPED (mode="drop"), which makes
        # n_past == S a write-nothing sentinel — the batched admission
        # prefill runs all max_batch rows in one dispatch and masks the
        # non-admitted slots' writes this way (engine/serving.py:_admit)
        if int8_kv:
            return (vals.at[il, b_ix, h_ix, s_dst].set(new_q, mode="drop"),
                    scales.at[il, b_ix, h_ix, s_dst].set(new_s, mode="drop"))
        return store.at[il, b_ix, h_ix, s_dst].set(
            new.astype(store.dtype), mode="drop")
    if int8_kv:
        return (
            jax.lax.dynamic_update_slice(
                vals, new_q[None], (il, zero, zero, n_past, zero)),
            jax.lax.dynamic_update_slice(
                scales, new_s[None], (il, zero, zero, n_past)),
        )
    return jax.lax.dynamic_update_slice(
        store, new.astype(store.dtype)[None], (il, zero, zero, n_past, zero))


def _kv_read(store, il, kv_len, dtype):
    """Layer slice of the cache, dequantized to ``dtype``: [B, H, S, D].
    Reads are fusable dynamic-slices — never a copy of the whole cache."""
    int8_kv = isinstance(store, tuple)
    arrs = store if int8_kv else (store,)
    out = []
    for a in arrs:
        x = jax.lax.dynamic_index_in_dim(a, il, 0, keepdims=False)
        if kv_len is not None and kv_len < x.shape[2]:
            # KV-length bucketing: attend only over the valid cache prefix
            # (static slice, engine-picked) instead of streaming all n_ctx
            # slots every step like the reference (vsim.cpp:573-596)
            x = jax.lax.slice_in_dim(x, 0, kv_len, axis=2)
        out.append(x)
    if int8_kv:
        vals, scales = out
        if _is_packed4(store):  # int4: unpack the two nibble planes
            p = vals.astype(jnp.int32)
            v = jnp.concatenate([(p & 0x0F) - 8, (p >> 4) - 8], axis=-1)
            return v.astype(dtype) * scales.astype(dtype)[..., None]
        return vals.astype(dtype) * scales.astype(dtype)[..., None]
    return out[0].astype(dtype)


def _linear(x, w, b, compute_dtype, act_quant=False):
    if act_quant:
        from vsim_tpu.ops.matmul import q4_matmul_act_quant

        y = q4_matmul_act_quant(x, w, compute_dtype=compute_dtype)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y.astype(compute_dtype)
    # f32 accumulation; bias folded into the Pallas kernel where supported
    y = q4_matmul(x, w, bias=b, compute_dtype=compute_dtype)
    return y.astype(compute_dtype)


def attention(
    cfg: ModelConfig,
    lp: Params,
    h: jnp.ndarray,  # [B, T, E] (already layernormed)
    k_all: Optional[jnp.ndarray],  # [L, B, H, S, D] whole-model cache
    v_all: Optional[jnp.ndarray],
    il: jnp.ndarray,  # int32 layer index into the cache
    positions: jnp.ndarray,  # int32 [B, T]
    n_past: jnp.ndarray,  # int32 scalar OR [B] (ragged continuous batching)
    slopes: Optional[jnp.ndarray],
    kv_len: Optional[int] = None,  # static attended-cache length bucket
    fresh_kv: bool = False,  # static: attend over this chunk's own k/v
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], Optional[jnp.ndarray],
           Optional[tuple]]:
    """Returns (out, k_all, v_all, pending): ``pending`` is non-None only on
    the deferred ragged decode path — this layer's quantized KV rows, to be
    scatter-written by forward() in ONE all-layer op after the layer loop."""
    B, T, E = h.shape
    H, D = cfg.n_head, cfg.head_dim
    cdt = h.dtype
    ragged = n_past.ndim == 1  # per-sequence cache lengths

    if "w_qkv" in lp:
        # fused head-interleaved qkv projection (models/init.py:
        # fuse_qkv_params) — one weight stream + one dispatch instead of 3
        qkv = _linear(h, lp["w_qkv"], lp.get("b_qkv"), cdt, cfg.act_quant)
        qkv = qkv.reshape(B, T, H, 3, D)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
    else:
        q = _linear(h, lp["wq"], lp.get("bq"), cdt,
                    cfg.act_quant).reshape(B, T, H, D)
        k = _linear(h, lp["wk"], lp.get("bk"), cdt,
                    cfg.act_quant).reshape(B, T, H, D)
        v = _linear(h, lp["wv"], lp.get("bv"), cdt,
                    cfg.act_quant).reshape(B, T, H, D)
    q = constrain(q, "batch", None, "heads", None)
    k = constrain(k, "batch", None, "heads", None)
    v = constrain(v, "batch", None, "heads", None)

    if cfg.n_rot > 0:
        q = apply_rope(q, positions, cfg.n_rot, interleaved=cfg.rotary_interleaved,
                       base=cfg.rope_base)
        k = apply_rope(k, positions, cfg.n_rot, interleaved=cfg.rotary_interleaved,
                       base=cfg.rope_base)

    if k_all is not None:
        # single-token decode over an int8 cache: fused Pallas kernel —
        # dequant + mask + online softmax + PV in one VMEM pass, the whole
        # stacked cache indexed by scalar-prefetched layer id (KV bytes
        # stream exactly once; ragged n_past supported).
        from vsim_tpu.ops.decode_attention import (
            decode_kernel_enabled,
            decode_attention_int8,
        )

        # Kernel gate, set from measurement (tools/attn_gate_probe.py r5):
        # the kernel wins whenever D % 128 == 0 — int8 at ~700 GB/s vs
        # ~220 einsum, int4 via the split-dot unpack (ops/decode_attention
        # split4: Dp = D/2 = 64 lanes; the lane-axis concat unpack ran 125
        # GB/s, split-dot 167 vs einsum 123).  r4's D % 256 int4 gate had
        # excluded every arch but GPT-J — pythia-12b, the reference's own
        # golden model, ran the unfused einsum serving step 1.35x slower.
        # For D in {64, 80, 96} (neox-20b, codegen-2b, gpt2, bloom-560m)
        # the measured kernel loses to XLA's einsum (sub-128 lane padding
        # wastes half the VPU/MXU) — those stay on the einsum path.
        use_kernel = (isinstance(k_all, tuple) and T == 1 and not fresh_kv
                      and D % 128 == 0 and decode_kernel_enabled())

        if use_kernel and ragged:
            # DEFERRED ragged write: a per-layer ragged scatter costs
            # 0.15 ms (×56/step = 8.5 ms at B=64 — the r3 serving wall,
            # VERDICT r3 weak #3), while ONE all-layer scatter is 0.12 ms.
            # Quantize this token's rows here, let the kernel merge them
            # into the online softmax (bit-parity round trip), and hand
            # them up to forward() for a single post-loop scatter.
            quantize = (_kv_quantize4 if _is_packed4(k_all)
                        else _kv_quantize)
            sdt = k_all[1].dtype
            knq, kns = quantize(jnp.swapaxes(k, 1, 2), sdt)
            vnq, vns = quantize(jnp.swapaxes(v, 1, 2), sdt)
            rows = (knq[:, :, 0], kns[:, :, 0], vnq[:, :, 0], vns[:, :, 0])
            scale = 1.0 / math.sqrt(D)
            ctx = decode_attention_int8(
                q, k_all, v_all, il, n_past, kv_len=kv_len, scale=scale,
                slopes=slopes, fresh_rows=rows,
                interpret=jax.default_backend() != "tpu",
            ).astype(cdt).reshape(B, T, E)
            out = _linear(ctx, lp["wo"], lp.get("bo"), cdt, cfg.act_quant)
            out = constrain(out, "batch", "seq", "embed")
            return out, k_all, v_all, rows

        # write ONLY the new [1, B, H, T, D] token slice into the carried
        # cache (aliased in-place by XLA); read the layer slice back as a
        # fusable dynamic-slice — never a copy of the whole layer cache.
        # int8 caches (kv_dtype="int8") quantize at insert and dequantize
        # fused into the attention dots (_kv_quantize/_kv_read).
        k_all = _kv_write(k_all, k, il, n_past, ragged, B, T)
        v_all = _kv_write(v_all, v, il, n_past, ragged, B, T)

        if use_kernel:
            scale = 1.0 / math.sqrt(D)
            ctx = decode_attention_int8(
                q, k_all, v_all, il, n_past, kv_len=kv_len, scale=scale,
                slopes=slopes,
                interpret=jax.default_backend() != "tpu",
            ).astype(cdt).reshape(B, T, E)
            out = _linear(ctx, lp["wo"], lp.get("bo"), cdt, cfg.act_quant)
            out = constrain(out, "batch", "seq", "embed")
            return out, k_all, v_all, None

        if fresh_kv:
            # Self-contained prefill (n_past == 0 by contract): attend over
            # this chunk's own unquantized k/v instead of reading back the
            # just-written cache.  Two wins: (a) prefill attention sees full-
            # precision keys/values (no int8/int4 round-trip); (b) no XLA op
            # ever reads the whole packed cache — at B >= 128 the dequant
            # einsum otherwise makes layout assignment flip the cache batch-
            # minor and copy its entire 2x footprint at entry (observed 7 GB
            # OOMing GPT-J-6B int4 B=128 prefill).
            keys = jnp.swapaxes(k, 1, 2)  # [B, H, T, D]
            values = jnp.swapaxes(v, 1, 2)
        else:
            keys = _kv_read(k_all, il, kv_len, cdt)  # [B, H, S, D]
            values = _kv_read(v_all, il, kv_len, cdt)
    else:  # cache-free mode (training / perplexity eval over full sequences)
        keys = jnp.swapaxes(k, 1, 2)  # [B, H, S, D]
        values = jnp.swapaxes(v, 1, 2)
    S = keys.shape[2]

    scale = 1.0 / math.sqrt(D)

    # blockwise (flash) attention for prefill-shaped steps: never
    # materializes [B, H, T, S] (ops/attention.py).  Threshold from the
    # measured full-model crossover (FLASH_BENCH r4: einsum edges flash 1%
    # at T=128, tie at 256, flash ahead from 512 and 4.5x on the attention
    # stack at 2048); ragged decode and short chunks keep the einsum path.
    if cfg.use_flash and not ragged and T >= 256 and S % 128 == 0:
        from vsim_tpu.ops.attention import flash_attention

        interp = jax.default_backend() != "tpu"
        ctx = flash_attention(
            q, keys, values, n_past=n_past, scale=scale, slopes=slopes,
            block_q=min(256, T), block_s=min(512, S), interpret=interp,
            kv_transposed=True,
        ).astype(cdt).reshape(B, T, E)
        out = _linear(ctx, lp["wo"], lp.get("bo"), cdt, cfg.act_quant)
        out = constrain(out, "batch", "seq", "embed")
        return out, k_all, v_all, None

    # feed the MXU its native input dtype (bf16 ~6x f32 rate on v5e) with
    # f32 accumulation; f32 compute_dtype mode keeps full-f32 parity.
    # keys/values are head-major [B, H, S, D]: transpose-free contractions.
    scores = jnp.einsum(
        "bthd,bhsd->bhts",
        q,
        keys.astype(q.dtype),
        preferred_element_type=jnp.float32,
    ) * scale

    if slopes is not None:  # ALiBi (BLOOM): scores += slope_h * s
        s_idx = jnp.arange(S, dtype=jnp.float32)
        scores = scores + slopes[None, :, None, None] * s_idx[None, None, None, :]

    # causal mask over the cache: key slot s visible iff s <= n_past[b] + t
    t_idx = jnp.arange(T, dtype=jnp.int32)
    s_idx = jnp.arange(S, dtype=jnp.int32)
    neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
    if ragged:
        mask = (s_idx[None, None, :]
                <= n_past[:, None, None] + t_idx[None, :, None])  # [B, T, S]
        scores = jnp.where(mask[:, None, :, :], scores, neg)
    else:
        mask = s_idx[None, :] <= (n_past + t_idx[:, None])  # [T, S]
        scores = jnp.where(mask[None, None, :, :], scores, neg)

    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum(
        "bhts,bhsd->bthd",
        probs.astype(cdt),
        values.astype(cdt),
        preferred_element_type=jnp.float32,
    ).astype(cdt)
    ctx = ctx.reshape(B, T, E)
    out = _linear(ctx, lp["wo"], lp.get("bo"), cdt, cfg.act_quant)
    out = constrain(out, "batch", "seq", "embed")
    return out, k_all, v_all, None


# activations the fused MLP kernel can compute.  Mosaic implements neither
# erf nor erfc, so exact-gelu archs (NeoX/pythia — the reference's primary
# driver arch, vsim.cpp:749) run an in-kernel A&S erf polynomial
# (|err| <= 1.5e-7, ops/pallas_q4.py:_erf_poly) — fusion AND numerics
_FUSED_ACTS = {"gelu_tanh": "gelu_tanh", "gelu_new": "gelu_tanh",
               "gelu_fast": "gelu_tanh", "relu": "relu",
               "gelu_exact": "gelu_exact"}


def mlp(cfg: ModelConfig, lp: Params, h: jnp.ndarray) -> jnp.ndarray:
    w_fc, w_proj = lp["w_fc"], lp["w_proj"]
    # fused fc+act+proj kernel on the plane-split decode path: one kernel
    # entry instead of two, no [*, F] intermediate round-trip, biases folded
    # (ops/pallas_q4.py:_kernel_mlp_ps)
    import os

    from vsim_tpu.ops.pallas_q4 import get_dequant_math

    # Under the gi math the UNFUSED two-matmul MLP wins: the grouped-integer
    # kernels at whole-O row-band geometry stream the fc/proj weights at the
    # DMA ceiling, while the fused kernel's fc column tiles are narrow-burst
    # (block_fh-wide) — measured r4: GPT-J B=1 5.15 ms unfused vs 6.20 fused.
    # The fused kernel remains the best choice for the f32xf/i32 maths
    # (r3: 7.07 -> 6.62 ms), so it stays routable.
    if (not cfg.act_quant
            and isinstance(w_fc, Q4Tensor) and w_fc.layout == "ps"
            and isinstance(w_proj, Q4Tensor) and w_proj.layout == "ps"
            and cfg.activation in _FUSED_ACTS
            and jax.default_backend() == "tpu"
            and get_dequant_math() != "gi"
            and not os.environ.get("VSIM_NO_FUSED_MLP")):
        n = 1
        for d in h.shape[:-1]:
            n *= d
        E, F = h.shape[-1], w_fc.out_features
        if n <= 8 and (F // 2) % 256 == 0 and (E // 2) % 256 == 0:
            from vsim_tpu.ops.pallas_q4 import pallas_q4_mlp_ps

            y = pallas_q4_mlp_ps(
                h, w_fc, lp.get("b_fc"), w_proj, lp.get("b_proj"),
                act=_FUSED_ACTS[cfg.activation],
            ).astype(h.dtype)
            return constrain(y, "batch", "seq", "embed")
    act = get_activation(cfg.activation)
    y = _linear(h, lp["w_fc"], lp.get("b_fc"), h.dtype, cfg.act_quant)
    y = constrain(y, "batch", None, "ffn")
    y = act(y.astype(jnp.float32)).astype(h.dtype)
    y = _linear(y, lp["w_proj"], lp.get("b_proj"), h.dtype, cfg.act_quant)
    return constrain(y, "batch", "seq", "embed")


def decoder_layer(
    cfg: ModelConfig,
    lp: Params,
    x: jnp.ndarray,
    k_all: Optional[jnp.ndarray],
    v_all: Optional[jnp.ndarray],
    il: jnp.ndarray,
    positions: jnp.ndarray,
    n_past: jnp.ndarray,
    slopes: Optional[jnp.ndarray],
    kv_len: Optional[int] = None,
    fresh_kv: bool = False,
):
    """One decoder block.  Residual topology per arch (vsim.cpp:627-708 for
    NeoX parallel/sequential; GPT-J shares one LN; BLOOM/GPT-2 sequential)."""
    h1 = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.ln_eps)
    attn_out, k_all, v_all, pending = attention(
        cfg, lp, h1, k_all, v_all, il, positions, n_past, slopes, kv_len,
        fresh_kv,
    )

    if cfg.parallel_residual:
        if cfg.shared_layernorm:  # GPT-J: MLP reads the same LN output
            h2 = h1
        else:  # NeoX: separate post_attention_layernorm on the *input*
            h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = x + attn_out + mlp(cfg, lp, h2)
    else:
        x = x + attn_out
        h2 = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.ln_eps)
        x = x + mlp(cfg, lp, h2)
    return x, k_all, v_all, pending


def _kv_apply_deferred(store, rows_q, rows_s, n_past):
    """ONE batched all-layer scatter of the deferred decode rows:
    rows_q [L, B, H, Dp], rows_s [L, B, H], per-sequence slot n_past [B]
    (n_past >= S drops — the serving write-nothing sentinel)."""
    vals, scales = store
    L, B, H = rows_s.shape  # noqa: N806
    b_ix = jnp.arange(B, dtype=jnp.int32)[:, None, None]
    h_ix = jnp.arange(H, dtype=jnp.int32)[None, :, None]
    s_dst = jnp.broadcast_to(n_past[:, None, None], (B, 1, 1))
    vals = vals.at[:, b_ix, h_ix, s_dst].set(
        rows_q[:, :, :, None, :], mode="drop")
    b2 = jnp.arange(B, dtype=jnp.int32)[:, None]
    h2 = jnp.arange(H, dtype=jnp.int32)[None, :]
    s2 = jnp.broadcast_to(n_past[:, None], (B, 1))
    scales = scales.at[:, b2, h2, s2].set(rows_s, mode="drop")
    return vals, scales


def embed(cfg: ModelConfig, params: Params, token_ids: jnp.ndarray, dtype):
    wte = params["wte"]
    if isinstance(wte, Q4Tensor):
        x = q4_take_rows(wte, token_ids, dtype=dtype)
    else:
        x = jnp.take(wte, token_ids, axis=0).astype(dtype)
    return x


def forward(
    cfg: ModelConfig,
    params: Params,
    token_ids: jnp.ndarray,  # int32 [B, T]
    cache: Optional[Dict[str, jnp.ndarray]],  # {"k","v": [L, B, H, S, D]} | None
    n_past: jnp.ndarray = 0,  # int32 scalar, or [B] for continuous batching
    kv_len: Optional[int] = None,  # STATIC: attended-cache length bucket
    fresh_kv: bool = False,  # STATIC: prefill-from-empty self-attention
) -> Tuple[jnp.ndarray, Optional[Dict[str, jnp.ndarray]]]:
    """Full forward: token ids → logits [B, T, n_vocab] + updated KV cache.

    ``cache=None`` runs cache-free (training / whole-sequence perplexity).
    A vector ``n_past`` gives each sequence its own cache length (the ragged
    decode step of the continuous-batching serving engine).  ``kv_len``
    (static) bounds how much of the cache attention reads — the engine
    buckets it so short sequences don't stream the whole n_ctx cache.
    ``fresh_kv=True`` (valid only when n_past == 0 and the whole prompt is in
    this chunk) writes the cache but attends over the chunk's own
    full-precision k/v — see attention()."""
    cdt = jnp.dtype(cfg.compute_dtype)
    B, T = token_ids.shape
    n_past = jnp.asarray(n_past, jnp.int32)
    if n_past.ndim == 1:  # ragged: per-sequence positions
        positions = n_past[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    else:
        positions = jnp.broadcast_to(
            n_past + jnp.arange(T, dtype=jnp.int32)[None, :], (B, T))

    x = embed(cfg, params, token_ids, cdt)
    if cfg.learned_pos:
        x = x + jnp.take(params["wpe"], positions, axis=0).astype(cdt)
    if "emb_ln_w" in params:  # BLOOM word_embeddings_layernorm
        x = layer_norm(x, params["emb_ln_w"], params["emb_ln_b"], cfg.ln_eps)
    x = constrain(x, "batch", "seq", "embed")

    slopes = alibi_slopes(cfg.n_head) if cfg.alibi else None

    # Unrolled layout (models/init.py:unstack_layer_params): Q4 weights are
    # per-layer tuples, so trace a Python loop with STATIC layer indices —
    # every matmul runs the flat Pallas kernel on its own buffer.  This is
    # the B=1 decode fix: the scalar-prefetch stacked kernel's layer-indexed
    # tile fetches cost 1.8-3.8x the flat kernel's per tile (BASELINE.md r2),
    # and with static il there is nothing left to index dynamically.  The
    # small stacked arrays (LN/bias) take static slices, fused by XLA.
    if any(isinstance(v, tuple) for v in params["layers"].values()):
        k_all = cache["k"] if cache is not None else None
        v_all = cache["v"] if cache is not None else None
        pendings = []
        for il in range(cfg.n_layer):
            lp = {k: v[il] for k, v in params["layers"].items()}
            x, k_all, v_all, pending = decoder_layer(
                cfg, lp, x, k_all, v_all, jnp.int32(il), positions, n_past,
                slopes, kv_len, fresh_kv,
            )
            pendings.append(pending)
        if pendings and pendings[0] is not None:
            from vsim_tpu.ops.decode_attention import scatter_rows_inplace

            rows = tuple(jnp.stack([p[i] for p in pendings])
                         for i in range(4))
            k_all, v_all = scatter_rows_inplace(
                k_all, v_all, rows, n_past,
                interpret=jax.default_backend() != "tpu")
        x = layer_norm(x, params["ln_f_w"], params["ln_f_b"], cfg.ln_eps)
        logits = q4_matmul(x, params["lm_head"], bias=params.get("lm_head_b"),
                           compute_dtype=cdt)
        if logits.shape[-1] != cfg.n_vocab:
            logits = logits[..., : cfg.n_vocab]
        logits = constrain(logits, "batch", None, "vocab")
        new_cache = None if cache is None else {"k": k_all, "v": v_all}
        return logits.astype(jnp.float32), new_cache

    # The KV cache rides in the scan *carry* and each layer updates its slice
    # in place (dynamic_update_index_in_dim on a carried buffer aliases, so
    # XLA keeps ONE cache allocation; passing the cache through scan xs/ys
    # would double-buffer ~2x the whole cache in HBM).
    #
    # Stacked Q4 weights do NOT ride the scan inputs: scan xs are dynamic-
    # sliced each step, which materializes a full copy of every layer's
    # weight in HBM (3x traffic).  They stay closed-over and each layer
    # addresses them with a Q4Layer(il) — the Pallas kernel then indexes the
    # stacked array in place via scalar prefetch (ops/pallas_q4.py).
    q4_stacked = {
        k: v for k, v in params["layers"].items() if isinstance(v, Q4Tensor)
    }
    small_xs = {
        k: v for k, v in params["layers"].items()
        if not isinstance(v, Q4Tensor)
    }

    def layer_params(xs_slice, il):
        lp = dict(xs_slice)
        for k, wstk in q4_stacked.items():
            lp[k] = Q4Layer(wstk, il)
        return lp

    if cache is not None:
        def body(carry, xs_slice):
            x, k_all, v_all, il = carry
            x, k_all, v_all, pending = decoder_layer(
                cfg, layer_params(xs_slice, il), x, k_all, v_all, il,
                positions, n_past, slopes, kv_len, fresh_kv
            )
            return (x, k_all, v_all, il + 1), pending

        (x, k_new, v_new, _), pendings = jax.lax.scan(
            body,
            (x, cache["k"], cache["v"], jnp.int32(0)),
            small_xs,
            length=cfg.n_layer,
        )
        if pendings is not None and isinstance(pendings, tuple):
            from vsim_tpu.ops.decode_attention import scatter_rows_inplace

            # scan stacked the per-layer rows to [L, ...]
            k_new, v_new = scatter_rows_inplace(
                k_new, v_new, pendings, n_past,
                interpret=jax.default_backend() != "tpu")
    else:
        def body_nc(carry, xs_slice):
            x, il = carry
            x, _, _, _ = decoder_layer(
                cfg, layer_params(xs_slice, il), x, None, None, il,
                positions, n_past, slopes
            )
            return (x, il + 1), None

        (x, _), _ = jax.lax.scan(
            body_nc, (x, jnp.int32(0)), small_xs, length=cfg.n_layer)
        k_new = v_new = None

    x = layer_norm(x, params["ln_f_w"], params["ln_f_b"], cfg.ln_eps)
    logits = q4_matmul(x, params["lm_head"], bias=params.get("lm_head_b"),
                       compute_dtype=cdt)
    if logits.shape[-1] != cfg.n_vocab:  # lm_head padded for kernel alignment
        logits = logits[..., : cfg.n_vocab]
    logits = constrain(logits, "batch", None, "vocab")
    new_cache = None if cache is None else {"k": k_new, "v": v_new}
    return logits.astype(jnp.float32), new_cache


def forward_nocache(cfg: ModelConfig, params: Params, token_ids: jnp.ndarray):
    logits, _ = forward(cfg, params, token_ids, None, 0)
    return logits


def init_cache(
    cfg: ModelConfig, batch: int, n_ctx: Optional[int] = None, dtype=None
) -> Dict[str, Any]:
    """Preallocated KV cache (reference: memory_k/v, vsim.cpp:349-366 — but
    head-major [L,B,H,S,D] and configurable dtype instead of flat f32; see
    _kv_write for why head-major).

    ``dtype`` (or cfg.kv_dtype) of int8 stores each side as a pair
    ``(values int8 [L,B,H,S,D], scales bf16 [L,B,H,S])`` — per-(token, head)
    symmetric quantization, half the decode-step KV HBM traffic of bf16.
    int4 plane-packs two dims per byte (``values uint8 [L,B,H,S,D/2]``) —
    quarter of bf16, doubling the decode batch that fits HBM."""
    S = n_ctx or cfg.n_ctx
    dt = jnp.dtype(dtype or cfg.kv_dtype)
    shape = (cfg.n_layer, batch, cfg.n_head, S, cfg.head_dim)
    if dt == jnp.dtype("int4"):
        assert cfg.head_dim % 2 == 0, "int4 KV needs an even head_dim"
        pshape = shape[:-1] + (cfg.head_dim // 2,)
        return {
            "k": (jnp.zeros(pshape, jnp.uint8),
                  jnp.zeros(shape[:-1], jnp.bfloat16)),
            "v": (jnp.zeros(pshape, jnp.uint8),
                  jnp.zeros(shape[:-1], jnp.bfloat16)),
        }
    if dt == jnp.int8:
        return {
            "k": (jnp.zeros(shape, jnp.int8),
                  jnp.zeros(shape[:-1], jnp.bfloat16)),
            "v": (jnp.zeros(shape, jnp.int8),
                  jnp.zeros(shape[:-1], jnp.bfloat16)),
        }
    return {"k": jnp.zeros(shape, dt), "v": jnp.zeros(shape, dt)}
