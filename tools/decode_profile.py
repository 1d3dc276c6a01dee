#!/usr/bin/env python
"""Decode-step time attribution on the real TPU.

Answers: of the B-batch decode step (bench.py headline), how much is
(a) the Q4 weight-streaming matmuls, (b) the attention/KV path, (c) the
rest (layernorms, rope, sampling, scan glue)?

Method: the axon tunnel adds ~30 ms to every host fetch and
block_until_ready does not block (see .claude/skills/verify/SKILL.md), so
each piece is timed as a chained on-device loop (output feeds next input,
defeating CSE) at two lengths; differencing cancels the constant.

Usage: python tools/decode_profile.py [--model gpt-j-6b] [--batch 32]
       [--kv-len 128] [--kv int8]
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


from vsim_tpu.monitor import chain_time  # per-phase device-time attribution


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt-j-6b")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--kv-len", type=int, default=128)
    ap.add_argument("--kv", default="int8", choices=["int8", "bfloat16", "int4"])
    ap.add_argument("--n-ctx", type=int, default=0,
                    help="cache allocation length (0 = 2*kv_len; the chain "
                    "loop donates its carry but each run still holds init + "
                    "one working copy, so a full 512-ctx GPT-J cache at "
                    "B=64 OOMs the 16 GB chip)")
    args = ap.parse_args()

    from vsim_tpu.engine.sampling import sample_jax
    from vsim_tpu.models.config import PRESETS
    from vsim_tpu.models.init import param_bytes, random_q4_params
    from vsim_tpu.models.transformer import forward, init_cache

    cfg = PRESETS[args.model].replace(
        n_ctx=args.n_ctx or max(256, 2 * args.kv_len),
        compute_dtype="bfloat16", kv_dtype=args.kv
    )
    B, S = args.batch, args.kv_len
    L, H, D, E, F = (cfg.n_layer, cfg.n_head, cfg.head_dim, cfg.n_embd,
                     cfg.n_ff)
    params = jax.device_put(random_q4_params(cfg, seed=0))
    wbytes = param_bytes(params)
    print(f"{args.model} B={B} kv_len={S} kv={args.kv} "
          f"weights={wbytes/1e9:.2f} GB", flush=True)

    from vsim_tpu.engine.generate import InferenceEngine

    engine = InferenceEngine(cfg, params)
    params = engine.params  # lm_head padded like the bench path

    # ---- (a) full decode step: forward + greedy sample --------------------
    cache0 = init_cache(cfg, B, n_ctx=cfg.n_ctx)
    tok0 = jnp.ones((B,), jnp.int32)
    lt0 = jnp.full((B, 64), -1, jnp.int32)
    key0 = jax.random.PRNGKey(0)

    def full_step(p, carry):
        tok, cache, n_past, lt, key = carry
        logits, cache = forward(cfg, p, tok[:, None], cache, n_past,
                                kv_len=S)
        key, sub = jax.random.split(key)
        nxt = sample_jax(logits[:, -1, :], lt, sub, top_k=1, top_p=1.0,
                         temperature=1.0, repeat_penalty=1.0, greedy=True)
        lt = jnp.concatenate([lt[:, 1:], nxt[:, None]], axis=1)
        return nxt, cache, n_past + 1, lt, key

    t_full = chain_time(full_step, params,
                        (tok0, cache0, jnp.int32(8), lt0, key0))
    print(f"full step           {t_full*1e3:8.3f} ms "
          f"({wbytes/t_full/1e9:6.1f} GB/s on weights)", flush=True)

    # ---- (b) Q4 matmuls only: same stacked weights, same scan shape -------
    from vsim_tpu.ops.matmul import Q4Layer, q4_matmul
    from vsim_tpu.quant.q4 import Q4Tensor

    def mm_step(p, carry):
        lw = p["layers"]
        (x,) = carry

        def body(c, _):
            h, il = c
            if "w_qkv" in lw:  # engine params are qkv-fused
                qkv = q4_matmul(h, Q4Layer(lw["w_qkv"], il),
                                compute_dtype=jnp.bfloat16)
                E3 = qkv.shape[-1]  # noqa: N806
                qkv = qkv.astype(jnp.bfloat16).reshape(*qkv.shape[:-1],
                                                       E3 // 3, 3)
                mix = jnp.sum(qkv, axis=-1)
            else:
                q = q4_matmul(h, Q4Layer(lw["wq"], il),
                              compute_dtype=jnp.bfloat16)
                k = q4_matmul(h, Q4Layer(lw["wk"], il),
                              compute_dtype=jnp.bfloat16)
                v = q4_matmul(h, Q4Layer(lw["wv"], il),
                              compute_dtype=jnp.bfloat16)
                mix = (q.astype(jnp.bfloat16) + k.astype(jnp.bfloat16)
                       + v.astype(jnp.bfloat16))
            o = q4_matmul(mix, Q4Layer(lw["wo"], il),
                          compute_dtype=jnp.bfloat16)
            f = q4_matmul(h + o.astype(jnp.bfloat16),
                          Q4Layer(lw["w_fc"], il), compute_dtype=jnp.bfloat16)
            p = q4_matmul(f.astype(jnp.bfloat16),
                          Q4Layer(lw["w_proj"], il),
                          compute_dtype=jnp.bfloat16)
            return (h + p.astype(jnp.bfloat16), il + 1), None

        (x, _), _ = jax.lax.scan(body, (x, jnp.int32(0)), None, length=L)
        y = q4_matmul(x, p["lm_head"], compute_dtype=jnp.bfloat16)
        x = x + y[..., :E].astype(jnp.bfloat16) * 1e-6
        return (x,)

    x0 = jnp.ones((B, 1, E), jnp.bfloat16)
    t_mm = chain_time(mm_step, params, (x0,))
    print(f"q4 matmuls only     {t_mm*1e3:8.3f} ms "
          f"({wbytes/t_mm/1e9:6.1f} GB/s on weights)", flush=True)

    # ---- (c) attention/KV path only (no weight matmuls) --------------------
    from vsim_tpu.models.transformer import _kv_read, _kv_write

    cache1 = init_cache(cfg, B, n_ctx=cfg.n_ctx)
    q0 = jnp.ones((B, 1, H, D), jnp.bfloat16)

    def attn_step(p, carry):
        del p
        q, cache, n_past = carry

        def body(c, _):
            q, k_all, v_all, il = c
            k_all = _kv_write(k_all, q, il, n_past, False, B, 1)
            v_all = _kv_write(v_all, q, il, n_past, False, B, 1)
            keys = _kv_read(k_all, il, S, jnp.bfloat16)  # [B, H, S, D]
            values = _kv_read(v_all, il, S, jnp.bfloat16)
            scores = jnp.einsum("bthd,bhsd->bhts", q, keys,
                                preferred_element_type=jnp.float32)
            s_idx = jnp.arange(S, dtype=jnp.int32)
            mask = s_idx[None, :] <= n_past
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
            scores = jnp.where(mask[None, None, :, :], scores, neg)
            probs = jax.nn.softmax(scores, axis=-1).astype(jnp.bfloat16)
            ctx = jnp.einsum("bhts,bhsd->bthd", probs, values,
                             preferred_element_type=jnp.float32)
            return (ctx.astype(jnp.bfloat16), k_all, v_all, il + 1), None

        (q, k_all, v_all, _), _ = jax.lax.scan(
            body, (q, cache["k"], cache["v"], jnp.int32(0)), None, length=L)
        return q, {"k": k_all, "v": v_all}, n_past

    t_attn = chain_time(attn_step, {}, (q0, cache1, jnp.int32(8)))
    kv_bytes = 2 * L * B * S * H * D * (1 if args.kv == "int8" else 2)
    print(f"attention/KV only   {t_attn*1e3:8.3f} ms "
          f"({kv_bytes/t_attn/1e9:6.1f} GB/s on KV reads)", flush=True)

    rest = t_full - t_mm - t_attn
    print(f"residual (glue)     {rest*1e3:8.3f} ms", flush=True)
    sol = wbytes / 819e9
    print(f"speed of light      {sol*1e3:8.3f} ms (weights @819 GB/s)  "
          f"full step = {t_full/sol:.2f}x SOL", flush=True)


if __name__ == "__main__":
    main()
