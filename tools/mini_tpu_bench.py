#!/usr/bin/env python
"""Our decode tokens/s on the SAME trained 25M model the reference binary
was measured on (tools/ref_baseline.py) — completes REF_BASELINE.json's
apples-to-apples row: identical weights, identical Q4_0 quantization,
reference on its CPU path vs this framework on one TPU v5e chip.

Usage: python tools/mini_tpu_bench.py [--ckpt /tmp/minipythia] [--tokens 256]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/minipythia")
    ap.add_argument("--tokens", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(ROOT, "REF_BASELINE.json"))
    args = ap.parse_args()

    from train_small import quantize_params  # noqa: E402 (tools path)
    from vsim_tpu.convert.store import load_params
    from vsim_tpu.engine.generate import InferenceEngine

    cfg, params = load_params(args.ckpt)
    cfg = cfg.replace(compute_dtype="bfloat16", kv_dtype="int8")
    qparams = jax.device_put(quantize_params(params))
    del params
    eng = InferenceEngine(cfg, qparams)
    del qparams

    prompt = [65, 66, 67, 68, 69, 70, 71, 72]
    ids = jnp.asarray([prompt], jnp.int32)
    kwargs = dict(top_k=1, top_p=1.0, temperature=1.0, repeat_penalty=1.0,
                  greedy=True)

    def timed(n_steps):
        cache = eng.new_cache(1)
        logits, cache = eng._prefill(eng.params, ids, cache, 0,
                                     kv_len=len(prompt))
        tok = jnp.argmax(logits[:, len(prompt) - 1, :], axis=-1).astype(
            jnp.int32)
        last = jnp.full((1, 64), -1, jnp.int32)
        key = jax.random.PRNGKey(0)
        int(tok[0])
        t0 = time.perf_counter()
        toks, cache, last, key = eng._decode_many(
            eng.params, tok, cache, len(prompt), last, key, n_steps=n_steps,
            kv_len=eng.kv_bucket(len(prompt) + n_steps + 1), **kwargs)
        int(toks[-1, 0])
        return time.perf_counter() - t0

    timed(32)
    timed(args.tokens)  # compile both
    t_short = min(timed(32) for _ in range(3))
    t_long = min(timed(args.tokens) for _ in range(3))
    per_tok = (t_long - t_short) / (args.tokens - 32)
    row = {
        "tokens_per_s": round(1.0 / per_tok, 1),
        "ms_per_token": round(per_tok * 1e3, 4),
        "device": str(jax.devices()[0]),
        "kv_dtype": "int8",
        "note": "same trained 25M model + same Q4_0 weights as the "
                "reference perf rows; B=1 greedy steady-state "
                "(chained-loop differenced)",
    }
    doc = json.load(open(args.out))
    doc["perf"]["ours_tpu_q4_0_b1"] = row
    ref = doc["perf"].get("q4_0_t1", {}).get("tokens_per_s")
    if ref:
        doc["perf"]["speedup_vs_reference_q4_t1"] = round(
            row["tokens_per_s"] / ref, 1)
    json.dump(doc, open(args.out, "w"), indent=1)
    print(json.dumps(row))
    print(f"updated {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
