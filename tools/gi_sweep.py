#!/usr/bin/env python
"""One-off geometry sweep for the gi kernel on the GPT-J decode shapes.
Feeds tools/kernel_lab.bench with explicit (block_o, block_kh) pairs and
prints GB/s per geometry; used to set _pick_blocks_gi (ops/pallas_q4.py)."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools as _ft

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tools.kernel_lab import bench, pack_ps
from vsim_tpu.ops.pallas_q4 import (_pallas_q4_matmul_ps_2d,
                                    _pallas_q4_matmul_ps_giw)


def _k_giw_dma(x_ref, p_ref, slo_ref, shi_ref, o_ref):
    """DMA ceiling probe with the giw block structure: whole-O row bands,
    resident output, k-grid — compute is one row-slice touch."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    r = min(8, o_ref.shape[0])
    o_ref[0:r, :] += (p_ref[0:r, :].astype(jnp.int32).astype(jnp.float32)
                      + slo_ref[0:r, :].astype(jnp.float32)
                      + shi_ref[0:r, :].astype(jnp.float32)
                      + x_ref[0:r, 0:1].astype(jnp.float32))


@_ft.partial(jax.jit, static_argnames=("block_kh",))
def giw_dma(x, packed, scales, *, block_kh):
    N, K = x.shape
    half_k = K // 2
    O = packed.shape[1]
    G = block_kh // 32
    nb2 = half_k // 32
    return pl.pallas_call(
        _k_giw_dma,
        grid=(half_k // block_kh,),
        in_specs=[
            pl.BlockSpec((N, K), lambda k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_kh, O), lambda k: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, O), lambda k: (k, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, O), lambda k, nb2=nb2, G=G: (nb2 // G + k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((N, O), lambda k: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, O), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(x, packed, scales, scales)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--shape", default="16384,4096")
    ap.add_argument("--geoms", default="4096,256;8192,128;8192,256;2048,256")
    args = ap.parse_args()
    O, K = (int(t) for t in args.shape.split(","))
    for geom in args.geoms.split(";"):
        kind = "gi"
        if ":" in geom:
            kind, geom = geom.split(":")
        bo, bkh = (int(t) for t in geom.split(","))
        bo, bkh = min(bo, O), min(bkh, K // 2)
        try:
            if kind == "giw":
                def fn(x, wp, scales, bkh=bkh):
                    return _pallas_q4_matmul_ps_giw(
                        x, wp, scales, None, block_kh=bkh,
                        ochunk=min(2048, O), interpret=False, has_bias=False)
            elif kind == "dma":
                def fn(x, wp, scales, bkh=bkh):
                    return giw_dma(x, wp, scales, block_kh=bkh)
            else:
                def fn(x, wp, scales, bo=bo, bkh=bkh):
                    return _pallas_q4_matmul_ps_2d(
                        x, wp, scales, None, block_o=bo, block_kh=bkh,
                        acc_dtype=jnp.bfloat16, interpret=False, math="gi",
                        has_bias=False)
            ms, gbs = bench(O, K, args.batch, fn, w_transform=pack_ps,
                            single_x=True)
            print(f"{kind:3s} O={O} K={K} bo={bo:5d} bkh={bkh:4d}  "
                  f"{ms:7.3f} ms {gbs:7.1f} GB/s", flush=True)
        except Exception as e:  # noqa: BLE001 — print and continue sweep
            print(f"{kind:3s} O={O} K={K} bo={bo:5d} bkh={bkh:4d}  FAILED "
                  f"{type(e).__name__}: {str(e)[:400]}", flush=True)


if __name__ == "__main__":
    main()
