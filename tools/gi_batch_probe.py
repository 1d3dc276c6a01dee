#!/usr/bin/env python
"""gi-bd batch probe (r5): can the grouped-integer band kernel serve
8 < n <= 32 at the DMA ceiling?

VERDICT r4 weak #1 asks for batch-decode weight streaming >= 500 GB/s.
batch_lab showed per-element maths cap at ~390-500 GB/s (f32x is the best;
bsub/bnos LOSE — the int->float convert costs more VPU than the bitcast
trick), so the only route past ~420 is the gi math, whose per-element work
is and/shift + convert only.  Its cost is G x MXU flops (the block-diagonal
activation expansion; groups are 32 wide vs the MXU's 128 contraction).
At n=16 with block_kh=128 (G=4) the inflated dot is ~3.7 ms on GPT-J
weights — under the 5.2 ms DMA floor — IF the MXU delivers near-rate at
M = n*G = 64 rows.  This probe measures that directly on the production
giw kernel with the n<=8 gate lifted.

Usage: python tools/gi_batch_probe.py [--check]
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

from vsim_tpu.quant.q4 import Q4Tensor, dequantize_km, to_plane_split
from vsim_tpu.ops.pallas_q4 import _pallas_q4_matmul_ps_giw


def run(x, w, bkh, ochunk=2048, kchunk=None):
    O = w.packed.shape[1]
    oc = min(ochunk, O)
    while O % oc:
        oc //= 2
    return _pallas_q4_matmul_ps_giw(
        x, w.packed, w.scales, None, block_kh=bkh,
        ochunk=oc, interpret=False, has_bias=False, kchunk=kchunk)


def run_f32x(x, w):
    from vsim_tpu.ops.pallas_q4 import _pallas_q4_matmul_ps_2d, _pick_blocks
    n, K = x.shape
    O = w.packed.shape[1]
    block_o, block_kh = _pick_blocks(K // 2, O, max(n, 8))
    return _pallas_q4_matmul_ps_2d(
        x, w.packed, w.scales, None, block_o=block_o, block_kh=block_kh,
        acc_dtype=jnp.bfloat16, interpret=False, math="f32x",
        has_bias=False)


def check(n=16, bkh=256, kchunk=None):
    rng = np.random.default_rng(1)
    O = K = 1024
    w = to_plane_split(jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32))))
    x = jnp.asarray(rng.standard_normal((n, K)), jnp.bfloat16)
    ref = x.astype(jnp.float32) @ dequantize_km(w, jnp.float32)
    got = run(x, w, bkh, kchunk=kchunk)
    scale = float(jnp.max(jnp.abs(ref))) or 1.0
    return float(jnp.max(jnp.abs(got - ref))) / scale


def bench(O, K, n, bkh, kchunk=None, variant="gi", iters=24,
          reps_in_step=8):
    rng = np.random.default_rng(0)
    w = to_plane_split(jax.device_put(Q4Tensor.from_dense_np(
        rng.standard_normal((O, K)).astype(np.float32))))
    x0 = jnp.asarray(rng.standard_normal((n, K)), jnp.bfloat16)

    @jax.jit
    def step(x):
        for _ in range(reps_in_step):
            y = (run(x, w, bkh, kchunk=kchunk) if variant == "gi"
                 else run_f32x(x, w))
            x = x0 + (y[:, :1] * 1e-9).astype(jnp.bfloat16)
        return x

    x = step(x0)
    float(x.sum())

    def go(m):
        x = x0
        t0 = time.perf_counter()
        for _ in range(m):
            x = step(x)
        float(x.sum())
        return time.perf_counter() - t0

    go(4)
    t_short = min(go(4) for _ in range(2))
    t_long = min(go(iters) for _ in range(2))
    per = (t_long - t_short) / (iters - 4) / reps_in_step
    wbytes = O * K // 2 + O * K // 32 * 2
    return per * 1e3, wbytes / per / 1e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--shapes", default="gptj")
    args = ap.parse_args()

    if args.check:
        for n in (8, 16, 24, 32):
            for kc in (64, 128, 256):
                try:
                    e = check(n, 256, kchunk=kc)
                    print(f"n={n:3d} kchunk={kc:4d} relerr {e:.2e}",
                          flush=True)
                except Exception as ex:
                    print(f"n={n:3d} kchunk={kc:4d} ERROR "
                          f"{str(ex).splitlines()[0][:120]}", flush=True)
        return 0

    shapes = {
        "gptj": [(12288, 4096), (16384, 4096), (4096, 16384)],
        "pythia12b": [(15360, 5120), (20480, 5120), (5120, 20480)],
    }[args.shapes]
    cases = [("gi", 128), ("gi", 256), ("f32x", None)]
    for O, K in shapes:
        for n in (8, 16, 32):
            for variant, kc in cases:
                try:
                    ms, gbs = bench(O, K, n, 256, kchunk=kc,
                                    variant=variant)
                    row = {"shape": [O, K], "n": n, "variant": variant,
                           "kchunk": kc, "ms": round(ms, 4),
                           "gbs": round(gbs, 1)}
                except Exception as ex:
                    row = {"shape": [O, K], "n": n, "variant": variant,
                           "kchunk": kc,
                           "error": str(ex).split("\n")[0][:140]}
                print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
