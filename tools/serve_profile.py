#!/usr/bin/env python
"""Attribute the serving-vs-plain decode step gap (VERDICT r3 weak #3).

r3 artifact: ServingEngine.step_chunk p50 29.4 ms at max_batch 64 vs the
plain B=64 decode loop's 14.9 ms — ~2x unattributed.  This probe times the
SAME forward at B=64 under each serving ingredient separately, as chained
on-device loops (one fetch per chain; differencing two lengths cancels the
axon RTT, the bench.py timed_loop recipe):

  uniform      — scalar n_past (the plain decode path)
  ragged       — n_past as a [B] vector, all equal (flips every ragged
                 branch: per-seq positions, scatter KV writes, ragged
                 decode-attention)
  ragged+mask  — adds the _step_many active/remaining/stop bookkeeping

Usage: python tools/serve_profile.py [--model gpt-j-6b] [--batch 64]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu.engine.sampling import sample_jax
from vsim_tpu.models.config import PRESETS
from vsim_tpu.models.init import prepare_unrolled_params, random_q4_params
from vsim_tpu.models.transformer import forward, init_cache


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="gpt-j-6b")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--kv", default="int8")
    ap.add_argument("--kv-len", type=int, default=128)
    ap.add_argument("--n-ctx", type=int, default=512)
    args = ap.parse_args()

    cfg = PRESETS[args.model].replace(n_ctx=args.n_ctx, kv_dtype=args.kv)
    params = jax.device_put(random_q4_params(cfg, seed=0))
    if cfg.fuse_qkv:
        from vsim_tpu.models.init import fuse_qkv_params

        params = fuse_qkv_params(cfg, params, consume=True)
    params = prepare_unrolled_params(params, consume=True)
    B = args.batch
    kv_len = args.kv_len
    sk = dict(top_k=0, top_p=1.0, temperature=1.0, repeat_penalty=1.0,
              greedy=True)

    @partial(jax.jit, donate_argnums=(1,),
             static_argnames=("mode", "n_steps"))
    def chain(params, cache, tok, n_past_s, n_past_v, active, remaining,
              stop_ids, last, key, *, mode, n_steps=16):
        def body(carry, _):
            cache, tok, nps, npv, active, remaining, last, key = carry
            if mode == "uniform":
                logits, cache = forward(cfg, params, tok[:, None], cache,
                                        nps, kv_len=kv_len)
            else:
                np_eff = (jnp.where(active, npv, jnp.int32(args.n_ctx))
                          if mode == "ragged+mask" else npv)
                logits, cache = forward(cfg, params, tok[:, None], cache,
                                        np_eff, kv_len=kv_len)
            logits = logits[:, -1, :]
            key, sub = jax.random.split(key)
            nxt = sample_jax(logits, last, sub, **sk)
            if mode == "ragged+mask":
                nxt = jnp.where(active, nxt, tok)
                last = jnp.where(active[:, None],
                                 jnp.concatenate([last[:, 1:], nxt[:, None]],
                                                 axis=1), last)
                npv = jnp.where(active, npv + 1, npv)
                remaining = jnp.where(active, remaining - 1, remaining)
                hit = (nxt[:, None] == stop_ids[None, :]).any(axis=1)
                active = active & ~hit & (remaining > 0)
            else:
                last = jnp.concatenate([last[:, 1:], nxt[:, None]], axis=1)
                npv = npv + 1
            return (cache, nxt, nps + 1, npv, active, remaining, last, key), \
                None

        carry, _ = jax.lax.scan(
            body, (cache, tok, n_past_s, n_past_v, active, remaining, last,
                   key), None, length=n_steps)
        return carry

    def timed(mode, n_steps, reps=3):
        times = []
        for _ in range(reps):
            cache = init_cache(cfg, B, n_ctx=args.n_ctx)
            tok = jnp.zeros((B,), jnp.int32)
            last = jnp.full((B, 64), -1, jnp.int32)
            key = jax.random.PRNGKey(0)
            active = jnp.ones((B,), bool)
            remaining = jnp.full((B,), 10 ** 6, jnp.int32)
            stop_ids = jnp.asarray([-1], jnp.int32)
            nps = jnp.int32(8)
            npv = jnp.full((B,), 8, jnp.int32)
            float(tok.sum())
            t0 = time.perf_counter()
            out = chain(params, cache, tok, nps, npv, active, remaining,
                        stop_ids, last, key, mode=mode, n_steps=n_steps)
            int(out[1][0])
            times.append(time.perf_counter() - t0)
            del cache, out
        return float(np.median(times))

    for mode in ("uniform", "ragged", "ragged+mask"):
        timed(mode, 4, reps=1)
        timed(mode, 20, reps=1)
        t4 = timed(mode, 4)
        t20 = timed(mode, 20)
        ms = (t20 - t4) / 16 * 1e3
        print(f"{mode:12s} step = {ms:7.3f} ms  (B={B}, kv={args.kv}, "
              f"kv_len={kv_len})", flush=True)


if __name__ == "__main__":
    main()
