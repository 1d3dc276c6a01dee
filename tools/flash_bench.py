#!/usr/bin/env python
"""Prefill attention on the chip: blockwise (flash) kernel vs einsum.

VERDICT r2 weak #3: ops/attention.py (flash + custom VJP) is oracle-tested
but was never measured on TPU and no preset enables it.  This decides its
fate with data:

  1. attention-op microbench: one full-layer-stack prefill attention pass,
     einsum vs flash, T ∈ {1024, 2048} (chained differencing per
     tools/kernel_lab.py);
  2. full-model prefill: PRESETS[model] with use_flash False/True at the
     same T — tokens/s of the whole prefill dispatch;
  3. one long-context decode line: B=1 decode step at n_ctx 2048 with the
     cache nearly full (the einsum path the reference never had —
     vsim.cpp:758 pins n_ctx=512).

Writes FLASH_BENCH.json; presets get use_flash=True wherever flash wins.

Usage: python tools/flash_bench.py [--model gpt-j-6b] [--out FLASH_BENCH.json]
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

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def chain_time(step, args0, n_short=2, n_long=6):
    """Best per-call seconds of ``step(*args) -> args`` chained on device;
    two loop lengths differenced so the tunnel RTT constant cancels."""
    def loop(args, n):
        for _ in range(n):
            args = step(*args)
        return args

    loops = {n: jax.jit(functools.partial(loop, n=n))
             for n in (n_short, n_long)}
    for n in loops:  # compile + completion barrier (value fetch)
        out = loops[n](args0)
        float(jax.tree.leaves(out)[0].sum())

    def t(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = loops[n](args0)
            float(jax.tree.leaves(out)[0].sum())
            best = min(best, time.perf_counter() - t0)
        return best

    return max((t(n_long) - t(n_short)) / (n_long - n_short), 1e-9)


def attn_micro(cfg, T, use_flash):
    """One L-layer prefill attention stack (no matmuls): [B=1, T] shapes."""
    import math

    from vsim_tpu.ops.attention import flash_attention

    H, D, L = cfg.n_head, cfg.head_dim, cfg.n_layer
    scale = 1.0 / math.sqrt(D)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, H, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, H, T, D)), jnp.bfloat16)

    def one(q, k, v):
        if use_flash:
            ctx = flash_attention(q, k, v, n_past=jnp.int32(0), scale=scale,
                                  slopes=None, block_q=min(256, T),
                                  block_s=min(512, T), kv_transposed=True)
        else:
            s = jnp.einsum("bthd,bhsd->bhts", q, k,
                           preferred_element_type=jnp.float32) * scale
            t_idx = jnp.arange(T, dtype=jnp.int32)
            mask = t_idx[None, :] <= t_idx[:, None]
            neg = jnp.asarray(jnp.finfo(jnp.float32).min, jnp.float32)
            s = jnp.where(mask[None, None, :, :].swapaxes(2, 3), s, neg)
            p = jax.nn.softmax(s, axis=-1)
            ctx = jnp.einsum("bhts,bhsd->bthd", p.astype(jnp.bfloat16), v,
                             preferred_element_type=jnp.float32)
        return ctx.astype(jnp.bfloat16)

    def step(q, k, v):
        x = q
        for _ in range(L):
            x = one(x.reshape(1, T, H, D), k, v).reshape(1, T, H, D)
            x = x + q * jnp.bfloat16(1e-6)
        return x, k, v

    return chain_time(step, (q, k, v))


def model_prefill(cfg, params_cpu, T, use_flash):
    from vsim_tpu.models.transformer import forward, init_cache

    cfg = cfg.replace(use_flash=use_flash)
    ids = jnp.zeros((1, T), jnp.int32)

    @jax.jit
    def pre(params, ids, cache):
        logits, cache = forward(cfg, params, ids, cache, 0, kv_len=T,
                                fresh_kv=True)
        return logits

    params = jax.device_put(params_cpu)
    cache = init_cache(cfg, 1, n_ctx=T)
    out = pre(params, ids, cache)
    float(out[0, 0, 0])  # compile+complete
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = pre(params, ids, cache)
        float(out[0, 0, 0])
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    ap = argparse.ArgumentParser()
    from vsim_tpu.models.config import PRESETS

    ap.add_argument("--model", default="gpt-j-6b", choices=sorted(PRESETS))
    ap.add_argument("--out", default=os.path.join(ROOT, "FLASH_BENCH.json"))
    ap.add_argument("--skip-model", action="store_true",
                    help="micro only (no 6B weights on the chip)")
    args = ap.parse_args()

    cfg = PRESETS[args.model].replace(compute_dtype="bfloat16",
                                      kv_dtype="int4", n_ctx=2048)
    print(f"device={jax.devices()[0].device_kind} model={args.model}",
          flush=True)
    result = {"model": args.model, "micro": {}, "prefill": {},
              "long_decode": {}}

    for T in (1024, 2048):
        row = {}
        for name, fl in (("einsum", False), ("flash", True)):
            t = attn_micro(cfg, T, fl)
            row[name + "_ms"] = round(t * 1e3, 3)
            print(f"micro T={T} {name}: {t*1e3:.3f} ms "
                  f"({cfg.n_layer} layers)", flush=True)
        row["flash_speedup"] = round(row["einsum_ms"] / row["flash_ms"], 3)
        result["micro"][str(T)] = row

    if not args.skip_model:
        from vsim_tpu.models.init import random_q4_params

        params_cpu = random_q4_params(cfg, seed=0)
        # the full sweep locates the einsum->flash crossover so the
        # production threshold (models/transformer.py:attention) is set
        # from measurement, not guessed (VERDICT r3 weak #8)
        for T in (128, 256, 512, 1024, 2048):
            row = {}
            for name, fl in (("einsum", False), ("flash", True)):
                t = model_prefill(cfg, params_cpu, T, fl)
                row[name + "_s"] = round(t, 4)
                row[name + "_tok_per_s"] = round(T / t, 1)
                print(f"prefill T={T} {name}: {t*1e3:.1f} ms = "
                      f"{T/t:.0f} tok/s", flush=True)
            row["flash_speedup"] = round(row["einsum_s"] / row["flash_s"], 3)
            result["prefill"][str(T)] = row

        # long-context decode: step latency at n_past ~ 1920 of a 2048 cache
        from vsim_tpu.engine.generate import InferenceEngine

        eng = InferenceEngine(cfg, jax.device_put(params_cpu))
        del params_cpu
        cache = eng.new_cache(1)
        ids = jnp.asarray([list(range(1, 17))], jnp.int32)
        logits, cache = eng._prefill(eng.params, ids, cache, 0, kv_len=16)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        last = jnp.full((1, 64), -1, jnp.int32)
        key = jax.random.PRNGKey(0)
        kwargs = dict(top_k=1, top_p=1.0, temperature=1.0,
                      repeat_penalty=1.0, greedy=True)
        # march n_past deep into the cache, then time steady-state steps
        # attending the full 2048-bucket
        import numpy as _np

        times = []
        n_past = 16
        for n_steps, record in ((64, False), (64, False),
                                (32, True), (32, True), (32, True)):
            t0 = time.perf_counter()
            toks, cache, last, key = eng._decode_many(
                eng.params, tok, cache, n_past, last, key, n_steps=n_steps,
                kv_len=2048, **kwargs)
            int(toks[-1, 0])
            if record:
                times.append((time.perf_counter() - t0) / n_steps)
            tok = toks[-1]
            n_past += n_steps
        step_ms = float(_np.median(times)) * 1e3
        result["long_decode"] = {
            "n_ctx": 2048, "kv_len": 2048, "n_past_final": n_past,
            "step_ms_b1": round(step_ms, 3),
            "note": "B=1 decode attending the full 2048-slot int4 cache "
                    "(the reference caps n_ctx at 512, vsim.cpp:758)",
        }
        print(f"long-context decode: {step_ms:.3f} ms/step at kv_len=2048",
              flush=True)

    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
