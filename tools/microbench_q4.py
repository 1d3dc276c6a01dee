#!/usr/bin/env python
"""Per-shape Q4 matmul microbenchmark on the real TPU.

Chained host dispatches of one compiled matmul (each step consumes the
previous step's output, so the device must run them serially), one scalar
fetch at the end.  Differencing two chain lengths cancels the axon tunnel's
constant ~30ms device->host RTT.  Reports effective HBM GB/s on the weight
bytes — the speed-of-light axis for decode.

First compile of each (shape, impl) variant takes ~2-3 min through the
tunnel; run in the background and read the log.

Usage: python tools/microbench_q4.py [--batch 16]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu.quant.q4 import Q4Tensor
from vsim_tpu.ops.matmul import q4_matmul


def bench_shape(O, K, batch, impl, iters=24, reps_in_step=8,
                dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    w = Q4Tensor.from_dense_np(rng.standard_normal((O, K)).astype(np.float32))
    w = jax.device_put(w)
    x0 = jnp.asarray(rng.standard_normal((batch, K)), dtype)

    @jax.jit
    def step(x):
        # reps_in_step chained matmuls per dispatch: per-dispatch launch
        # overhead (~0.2 ms) would otherwise swamp sub-ms kernels
        for _ in range(reps_in_step):
            y = q4_matmul(x, w, impl=impl)
            x = jnp.tile(y[:, :1].astype(dtype), (1, K)) * 1e-9 + x0
        return x

    x = step(x0)  # compile
    float(x.sum())  # barrier

    def run(n):
        x = x0
        t0 = time.perf_counter()
        for _ in range(n):
            x = step(x)
        float(x.sum())
        return time.perf_counter() - t0

    run(4)
    t_short = min(run(4) for _ in range(2))
    t_long = min(run(iters) for _ in range(2))
    per_step = (t_long - t_short) / (iters - 4) / reps_in_step
    gbs = w.nbytes / per_step / 1e9
    return per_step * 1e3, gbs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    print(f"device={jax.devices()[0].device_kind} batch={args.batch}",
          flush=True)
    # GPT-J-6B decode shapes (E=4096, ff=16384, vocab=50400)
    cases = [
        ("qkv/o  4096x4096 ", 4096, 4096, "pallas"),
        ("fc    16384x4096 ", 16384, 4096, "pallas"),
        ("proj   4096x16384", 4096, 16384, "pallas"),
        ("lm_pad 50432x4096", 50432, 4096, "pallas"),
        ("qkv/o  4096x4096 ", 4096, 4096, "xla"),
        ("lm    50400x4096 ", 50400, 4096, "xla"),
    ]
    for name, O, K, impl in cases:
        try:
            t0 = time.perf_counter()
            ms, gbs = bench_shape(O, K, args.batch, impl)
            print(f"{name}  {impl:6s}  {ms:8.3f} ms  {gbs:7.1f} GB/s"
                  f"   (case wall {time.perf_counter()-t0:.0f}s)", flush=True)
        except Exception as e:
            print(f"{name}  {impl:6s}  FAILED: {type(e).__name__}: {e}",
                  flush=True)


if __name__ == "__main__":
    main()
