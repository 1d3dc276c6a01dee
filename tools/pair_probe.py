#!/usr/bin/env python
"""Isolate the pairA bitcast kernel: compile-only vs run, tiny shapes.

pair_sweep.py hangs before printing its first result line; this probe
lowers/compiles each stage separately with wall timing so the hang can be
attributed (Mosaic compile vs device execution).

Usage: python tools/pair_probe.py [stage]
  stage ∈ {bitcast, pairA, pairA_run, f32b_run}
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def k_bitcast(p_ref, o_ref):
    p = p_ref[:].astype(jnp.int32)
    bits = (p & 0x0F) | ((p & 0xF0) << 12)
    t = pltpu.bitcast(bits | jnp.int32(0x43004300), jnp.bfloat16)
    o_ref[:] = t.astype(jnp.float32)


def k_pairA(x_ref, p_ref, o_ref):
    p = p_ref[:].astype(jnp.int32)
    bits = (p & 0x0F) | ((p & 0xF0) << 12)
    t = pltpu.bitcast(bits | jnp.int32(0x43004300), jnp.bfloat16)
    w = t - jnp.bfloat16(136.0)
    o_ref[:] = jnp.dot(x_ref[:], w, preferred_element_type=jnp.float32)


def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "bitcast"
    log(f"stage={stage} device={jax.devices()[0].device_kind}")
    rng = np.random.default_rng(0)

    if stage == "bitcast":
        p = jnp.asarray(rng.integers(0, 256, (256, 256)), jnp.uint8)
        fn = pl.pallas_call(
            k_bitcast,
            out_shape=jax.ShapeDtypeStruct((512, 256), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        t0 = time.time()
        lowered = jax.jit(fn).lower(p)
        log(f"lowered in {time.time()-t0:.1f}s")
        t0 = time.time()
        compiled = lowered.compile()
        log(f"compiled in {time.time()-t0:.1f}s")
        t0 = time.time()
        out = np.asarray(compiled(p))
        log(f"ran in {time.time()-t0:.1f}s")
        # verify semantics: which rows get low nibble?
        pb = np.asarray(p)
        lo = (pb & 0x0F).astype(np.float32)
        hi = (pb >> 4).astype(np.float32)
        even, odd = out[0::2], out[1::2]
        log(f"low->even rows: {np.allclose(even, 128+lo) and np.allclose(odd, 128+hi)}")
        log(f"low->odd  rows: {np.allclose(odd, 128+lo) and np.allclose(even, 128+hi)}")
        log(f"sample out[:4,0]={out[:4,0]} p[0:2,0]={pb[0:2,0]}")
    elif stage in ("pairA", "pairA_run"):
        N, KH, O = 8, 256, 256
        p = jnp.asarray(rng.integers(0, 256, (KH, O)), jnp.uint8)
        x = jnp.asarray(rng.standard_normal((N, 2 * KH)), jnp.bfloat16)
        fn = pl.pallas_call(
            k_pairA,
            out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        t0 = time.time()
        compiled = jax.jit(fn).lower(x, p).compile()
        log(f"compiled in {time.time()-t0:.1f}s")
        if stage == "pairA_run":
            t0 = time.time()
            out = np.asarray(compiled(x, p))
            log(f"ran in {time.time()-t0:.1f}s sum={out.sum():.3f}")
    log("done")


if __name__ == "__main__":
    main()
