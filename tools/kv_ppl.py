#!/usr/bin/env python
"""KV-cache quantization quality: teacher-forced ppl through the DECODE path.

The 4,649 tok/s headline rides kv_dtype=int4 (BENCH_r02), whose quality
cost was asserted ("~2% attention-output RMS error",
models/transformer.py:_kv_quantize4) but never measured as perplexity
(VERDICT r2 weak #4).  This measures it the honest way: Q4_0 weights (the
production inference mode) with the tokens fed ONE AT A TIME through the
cache path — every step attends over the quantized KV entries of all
previous positions, exactly like production decode — for
kv_dtype ∈ {float32, bfloat16, int8, int4}, on the trained 25M model's
held-out bytes.  (Prefill always attends full-precision k/v via fresh_kv,
so position 0's cache write is the only prefill contribution.)

Reference anchor: the reference cache is always f32 (vsim.cpp:349-366);
bf16/int8/int4 are this framework's HBM-traffic upgrades.

Writes the kv rows into PPL.json.  CPU-friendly: run with JAX_PLATFORMS=cpu.

Usage:
  JAX_PLATFORMS=cpu python tools/kv_ppl.py [--ckpt /tmp/minipythia]
      [--windows 64] [--win-len 512]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/minipythia")
    ap.add_argument("--windows", type=int, default=64)
    ap.add_argument("--win-len", type=int, default=512)
    ap.add_argument("--out", default=os.path.join(ROOT, "PPL.json"))
    args = ap.parse_args()

    from train_small import build_corpus, quantize_params
    from vsim_tpu.convert.store import load_params
    from vsim_tpu.models.transformer import forward, init_cache

    cfg0, params = load_params(args.ckpt)
    qparams = quantize_params(params)
    del params

    _, eval_bytes = build_corpus()
    W, T = args.windows, args.win_len
    need = W * T
    assert len(eval_bytes) >= need, (len(eval_bytes), need)
    # windows strided evenly over the WHOLE eval set, so the absolute ppl is
    # comparable with PPL.json's full-200K rows (the first eval files alone
    # measured ~2x the corpus-wide ppl)
    starts = np.linspace(0, len(eval_bytes) - T, W).astype(np.int64)
    ids_np = np.stack([np.asarray(eval_bytes[s: s + T], np.int32)
                       for s in starts])
    ids = jnp.asarray(ids_np)

    results = {}
    for kv in ("float32", "bfloat16", "int8", "int4"):
        cfg = cfg0.replace(compute_dtype="float32", kv_dtype=kv)

        @jax.jit
        def step(cache, tok, n_past):
            logits, cache = forward(cfg, qparams, tok[:, None], cache, n_past)
            return cache, logits[:, 0]

        t0 = time.time()
        # position 0 seeds the cache (single-token prefill), then every next
        # position decodes against the quantized cache
        nll, n = 0.0, 0
        cache = init_cache(cfg, W, n_ctx=T)
        cache, logits = step(cache, ids[:, 0], jnp.int32(0))
        for t in range(1, T):
            lse = jax.nn.log_softmax(logits, axis=-1)
            nll += float(-jnp.take_along_axis(
                lse, ids[:, t][:, None], axis=1).sum())
            n += W
            cache, logits = step(cache, ids[:, t], jnp.int32(t))
        ppl = float(np.exp(nll / n))
        results[f"kv_{kv}"] = round(ppl, 4)
        print(f"kv={kv}: ppl {ppl:.4f} ({n} positions, "
              f"{time.time() - t0:.0f}s)", flush=True)

    base = results.get("kv_float32")
    for kv in ("bfloat16", "int8", "int4"):
        results[f"delta_kv_{kv}_vs_f32"] = round(results[f"kv_{kv}"] - base, 4)

    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing.update(results)
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"updated {args.out}: {results}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
