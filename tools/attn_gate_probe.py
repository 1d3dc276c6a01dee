#!/usr/bin/env python
"""Decode-attention D-gate probe (r5, VERDICT weak #2).

The fused decode-attention kernel (ops/decode_attention.py) gates on the
packed minor dim being a 128 lane multiple: D % 256 == 0 for int4 (Dp=D/2),
D % 128 for int8 — so of the zoo's head dims {64, 80, 96, 128, 256} only
GPT-J (256) gets the kernel on int4 KV, and pythia-12b (128), the
reference's OWN golden model, runs the unfused einsum path with
whole-cache dequant (41.6 vs 30.7 ms serving step, SERVE_BENCH r4).

Mosaic supports sub-128 minor block dims by lane-padding in VMEM, and the
DMA stays fully contiguous because the block spans the array's ENTIRE
minor dim ([1,1,H,ts,Dp] of [L,B,H,S,Dp]).  This probe measures whether
that actually lowers and at what speed, for every zoo head dim, int8 and
int4, vs the einsum oracle path.

Usage: python tools/attn_gate_probe.py [--check]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu.models.transformer import _kv_quantize, _kv_quantize4, _kv_read
from vsim_tpu.ops.decode_attention import (
    decode_attention_int8,
    decode_attention_oracle,
)


def make_cache(rng, L, B, H, S, D, kv):
    x = rng.standard_normal((L * B, H, S, D)).astype(np.float32)
    quant = _kv_quantize4 if kv == "int4" else _kv_quantize
    q, s = quant(jnp.asarray(x), jnp.bfloat16)
    Dp = q.shape[-1]
    return (q.reshape(L, B, H, S, Dp), s.reshape(L, B, H, S))


def check_one(D, H, kv, B=4, S=256, L=2):
    rng = np.random.default_rng(0)
    k_store = make_cache(rng, L, B, H, S, D, kv)
    v_store = make_cache(rng, L, B, H, S, D, kv)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    n_past = jnp.asarray(rng.integers(1, S - 1, size=(B,)), jnp.int32)
    scale = 1.0 / math.sqrt(D)
    ref = decode_attention_oracle(q, k_store, v_store, 1, n_past,
                                  kv_len=S, scale=scale)
    got = decode_attention_int8(q, k_store, v_store, 1, n_past,
                                kv_len=S, scale=scale)
    m = float(jnp.max(jnp.abs(ref))) or 1.0
    return float(jnp.max(jnp.abs(got - ref.astype(jnp.float32)))) / m


def make_cache_fast(rng, L, B, H, S, D, kv):
    """Random already-quantized cache (perf probe: bytes and layout are what
    matter, not real values; the f32 staging of a real quantize OOMs 12B+
    shapes)."""
    Dp = D // 2 if kv == "int4" else D
    dt = np.uint8 if kv == "int4" else np.int8
    q = rng.integers(0, 255 if kv == "int4" else 127,
                     size=(L, B, H, S, Dp)).astype(dt)
    s = (rng.random((L, B, H, S)).astype(np.float32) * 0.02 + 0.01)
    return (jax.device_put(jnp.asarray(q)),
            jax.device_put(jnp.asarray(s, jnp.bfloat16)))


def bench_one(D, H, kv, L, B, S, iters=16, reps=2):
    rng = np.random.default_rng(0)
    k_store = make_cache_fast(rng, L, B, H, S, D, kv)
    v_store = make_cache_fast(rng, L, B, H, S, D, kv)
    q0 = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.bfloat16)
    n_past = jnp.full((B,), S - 2, jnp.int32)
    scale = 1.0 / math.sqrt(D)

    def one_layer(q, il, k_store, v_store):
        return decode_attention_int8(q, k_store, v_store, il, n_past,
                                     kv_len=S, scale=scale)

    def one_layer_einsum(q, il, k_store, v_store):
        keys = _kv_read(k_store, jnp.int32(il), S, jnp.bfloat16)
        values = _kv_read(v_store, jnp.int32(il), S, jnp.bfloat16)
        s = jnp.einsum("bthd,bhsd->bhts", q.astype(jnp.float32),
                       keys.astype(jnp.float32)) * scale
        idx = jnp.arange(S, dtype=jnp.int32)
        mask = idx[None, :] <= n_past[:, None]
        s = jnp.where(mask[:, None, None, :], s,
                      jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhts,bhsd->bthd", p.astype(jnp.bfloat16),
                          values)

    out = {}
    for name, f in (("kernel", one_layer), ("einsum", one_layer_einsum)):
        @jax.jit
        def step(q, ks, vs, f=f):
            # stores ride as ARGUMENTS: a closed-over device array becomes a
            # captured constant shipped WITH the remote compile request
            # (HTTP 413 at 12B cache sizes through the axon tunnel).
            # EVERY layer's ctx feeds the dep chain — an overwritten ctx
            # lets XLA dead-code-eliminate all but the last layer.
            for _ in range(reps):
                acc = 0.0
                for il in range(L):
                    acc = acc + f(q, il, ks, vs)
                q = q0 + (acc * 1e-9).astype(jnp.bfloat16)
            return q

        try:
            q = step(q0, k_store, v_store)
            float(q.sum())

            def go(m):
                q = q0
                t0 = time.perf_counter()
                for _ in range(m):
                    q = step(q, k_store, v_store)
                float(q.sum())
                return time.perf_counter() - t0

            go(2)
            t_s = min(go(2) for _ in range(2))
            t_l = min(go(iters) for _ in range(2))
            per = (t_l - t_s) / (iters - 2) / reps  # all-L layers, ms
            kv_bytes = 2 * (k_store[0].size + k_store[1].size * 2)
            out[name] = {"ms": round(per * 1e3, 4),
                         "gbs": round(kv_bytes / per / 1e9, 1)}
        except Exception as ex:
            out[name] = {"error": str(ex).split("\n")[0][:140]}
    return out


# zoo rows: (name, D, H, L) — L clipped to 4 for the perf probe (per-layer
# rate is what matters; full-L einsum closures compile for minutes through
# the tunnel)
ZOO = [
    ("pythia-12b", 128, 40, 4),
    ("gpt-neox-20b", 96, 64, 4),
    ("codegen-2b", 80, 32, 4),
    ("gpt2", 64, 12, 4),
    ("bloom-560m", 64, 16, 4),
    ("gpt-j-6b", 256, 16, 4),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--kvlen", type=int, default=512)
    args = ap.parse_args()

    if args.check:
        for name, D, H, _ in ZOO:
            for kv in ("int8", "int4"):
                try:
                    e = check_one(D, H, kv)
                    print(f"{name:14s} D={D:3d} {kv}: relerr {e:.2e}",
                          flush=True)
                except Exception as ex:
                    print(f"{name:14s} D={D:3d} {kv}: ERROR "
                          f"{str(ex).splitlines()[0][:120]}", flush=True)
        return 0

    for name, D, H, L in ZOO:
        for kv in ("int8", "int4"):
            r = bench_one(D, H, kv, L, args.batch, args.kvlen)
            print(json.dumps({"model": name, "D": D, "H": H, "L": L,
                              "kv": kv, "B": args.batch, "S": args.kvlen,
                              **{f"{k}_{kk}": vv for k, v in r.items()
                                 for kk, vv in v.items()}}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
