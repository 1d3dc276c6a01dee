#!/usr/bin/env python
"""Reference-binary perf at FLAGSHIP scale: pythia-12b-shaped Q4_0.

Round-3's REF_BASELINE measured the reference binary only at 25M-toy scale;
its golden config is oasst-pythia-12b (Makefile-ubuntu:26,
README-NAKASHIMA:6-10).  No pretrained checkpoint reaches this container,
but for DECODE PERF the weights' values are irrelevant — the binary streams
identical bytes and does identical arithmetic on random weights (the same
argument BENCH_MATRIX uses for our side).  So: generate a random
pythia-12b-shaped model (n_vocab 50288 / E 5120 / H 40 / L 36 / F 20480 /
rot 32 — the exact matmul shapes the reference's own IMAX notes record,
imax.c:1156-1171), export through our ggml writer, run the reference
binary's golden sampling config with a small n_predict, parse the monitor
report (monitor.c:182-262).  Appends a ``perf.q4_0_t1_12b`` row to
REF_BASELINE.json.

CPU-only; safe to run alongside TPU work (the binary never touches jax).

Usage: python tools/ref_baseline_12b.py [--n-predict 16]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

from tools.ref_baseline import build_binary, perf_run

# the reference's own recorded pythia-12b geometry (imax.c:1156-1171:
# K = 5120/20480, rows = 5120/20480/50288; vsim.cpp hparams order)
CFG = dict(n_vocab=50288, n_embd=5120, n_head=40, n_layer=36, n_ff=20480,
           n_rot=32, parallel_residual=1)
GOLDEN_PROMPT = [50278, 12092, 2, 0, 50281]  # Makefile-ubuntu:26


def write_random_12b(path: str, seed: int = 0) -> int:
    """Stream a random pythia-12b-shaped Q4_0 ggml file to ``path``."""
    from vsim_tpu.convert.ggml_file import (
        _GGML_NAME_MAPS, FTYPE_F32, FTYPE_Q4_0, GGMLTensor, write_ggml)
    from vsim_tpu.quant.q4 import quantize_q4_0_np, to_ggml_q4_0_bytes

    rng = np.random.default_rng(seed)
    names = _GGML_NAME_MAPS["gptneox"]
    E, F, V, L = CFG["n_embd"], CFG["n_ff"], CFG["n_vocab"], CFG["n_layer"]

    def q4(shape):
        data = rng.standard_normal(shape, dtype=np.float32) * 0.02
        packed, scales = quantize_q4_0_np(data, scale_dtype=np.float32)
        return FTYPE_Q4_0, to_ggml_q4_0_bytes(packed, scales), shape

    def f32(shape):
        data = rng.standard_normal(shape, dtype=np.float32) * 0.02
        return (FTYPE_F32,
                np.ascontiguousarray(data).view(np.uint8).reshape(-1), shape)

    tensors = []

    def add(slot, kind, i=None):
        ftype, raw, shape = kind
        tensors.append(GGMLTensor(names[slot].format(i=i), shape, ftype, raw))

    t0 = time.time()
    add("wte", q4((V, E)))
    for i in range(L):
        add("ln1_w", f32((E,)), i)
        add("ln1_b", f32((E,)), i)
        add("wq", q4((E, E)), i)
        add("bq", f32((E,)), i)
        add("wk", q4((E, E)), i)
        add("bk", f32((E,)), i)
        add("wv", q4((E, E)), i)
        add("bv", f32((E,)), i)
        add("wo", q4((E, E)), i)
        add("bo", f32((E,)), i)
        add("ln2_w", f32((E,)), i)
        add("ln2_b", f32((E,)), i)
        add("w_fc", q4((F, E)), i)
        add("b_fc", f32((F,)), i)
        add("w_proj", q4((E, F)), i)
        add("b_proj", f32((E,)), i)
        if i % 6 == 0:
            print(f"  layer {i}/{L} ({time.time() - t0:.0f}s)", flush=True)
    add("ln_f_w", f32((E,)))
    add("ln_f_b", f32((E,)))
    add("lm_head", q4((V, E)))

    hp = dict(n_vocab=V, n_embd=E, n_head=CFG["n_head"], n_layer=L,
              n_rot=CFG["n_rot"],
              use_parallel_residual=CFG["parallel_residual"], ftype=2)
    vocab = [f"<t{i}>".encode() for i in range(V)]
    write_ggml(path, "gptneox", hp, vocab, tensors)
    return os.path.getsize(path)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-predict", type=int, default=16)
    ap.add_argument("--model", default="/tmp/ref12b/pythia12b-q4.bin")
    ap.add_argument("--threads", type=int, default=1)  # golden value
    args = ap.parse_args()

    binary = build_binary()
    os.makedirs(os.path.dirname(args.model), exist_ok=True)
    if not os.path.exists(args.model):
        print("generating random pythia-12b Q4_0 ggml ...", flush=True)
        size = write_random_12b(args.model)
        print(f"wrote {args.model}: {size / 1e9:.2f} GB", flush=True)

    print("running reference golden config (this streams ~6.6 GB of Q4 "
          "weights per token through the scalar dot) ...", flush=True)
    row = perf_run(binary, args.model, GOLDEN_PROMPT, args.n_predict,
                   args.threads)
    row["model"] = "pythia-12b-shaped random Q4_0 (identical bytes/compute)"
    row["file_gb"] = round(os.path.getsize(args.model) / 1e9, 2)
    print(json.dumps(row, indent=1))

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "REF_BASELINE.json")
    with open(out) as f:
        doc = json.load(f)
    doc.setdefault("perf", {})["q4_0_t1_12b"] = row
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"updated {out}", flush=True)


if __name__ == "__main__":
    main()
