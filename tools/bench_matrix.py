#!/usr/bin/env python
"""Run the BASELINE.md benchmark configurations and write BENCH_MATRIX.json.

Configs (BASELINE.md "Targets" table — the reference publishes no numbers,
so these are the self-established baselines):
  * bloom-560m  INT4 greedy decode, batch 1 (p50 + tokens/s)
  * gpt2        INT4 (sampling + return-logits mode exercised)
  * codegen-2b  INT4 (GPT-J arch variant)
  * gpt-j-6b    INT4 batch-64 continuous-batching shape (headline)
  * pythia-12b  INT4 batch-16 (12B model on one 16 GB chip; B=32 KV would
    not leave headroom next to the 6.8 GB weights)

Each config is one subprocess `python bench.py ...` (the TPU tunnel is
single-client: strictly sequential, one python at a time), parsed from its
single JSON stdout line.

Usage: python tools/bench_matrix.py [--out BENCH_MATRIX.json] [--skip ...]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import time
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    {"name": "bloom-560m-b1", "args": ["--model", "bloom-560m", "--batch",
                                       "1", "--tokens", "64"]},
    {"name": "gpt2-b1", "args": ["--model", "gpt2", "--batch", "1",
                                 "--tokens", "64"]},
    {"name": "codegen-2b-b32", "args": ["--model", "codegen-2b", "--batch",
                                        "32", "--tokens", "64"]},
    {"name": "gpt-j-6b-b64", "args": ["--model", "gpt-j-6b", "--batch",
                                      "64", "--tokens", "64"]},
    # the quality-clean aggregate configuration: int8 KV is ppl-free
    # (PPL.json: +0.02%) where the int4-KV headline carries +2.0%; B=128
    # int8 KV (15 GB) does not fit next to 3.4 GB weights on a 16 GB chip,
    # so the clean headline batch is 64
    {"name": "gpt-j-6b-b64-int8kv", "args": ["--model", "gpt-j-6b",
                                             "--batch", "64", "--kv",
                                             "int8", "--tokens", "64"]},
    # 12B INT4 = 6.8 GB weights; B=32 int8 KV at 512 ctx = 7.5 GB
    {"name": "pythia-12b-b16", "args": ["--model", "pythia-12b", "--batch",
                                        "16", "--tokens", "64"]},
    # the biggest model in the reference registry (GPT-NeoXT-Chat-Base-20B):
    # 11.6 GB int4 weights on one 16 GB chip (unstacked generation — no
    # stacked transient)
    {"name": "gpt-neox-20b-b8", "args": ["--model", "gpt-neox-20b",
                                         "--batch", "8", "--tokens", "32"]},
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(ROOT, "BENCH_MATRIX.json"))
    ap.add_argument("--only", nargs="*", default=None)
    args = ap.parse_args()

    results = {}
    if args.only and os.path.exists(args.out):
        # --only reruns one config: keep the other entries
        with open(args.out) as f:
            results = json.load(f)
    for cfg in CONFIGS:
        if args.only and cfg["name"] not in args.only:
            continue
        cmd = [sys.executable, os.path.join(ROOT, "bench.py")] + cfg["args"]
        print(f"== {cfg['name']}: {' '.join(cmd[1:])}", flush=True)
        t0 = time.time()
        try:
            env = dict(os.environ)
            # reuse compiled executables across configs (the axon-tunnel
            # remote compile costs minutes per program)
            env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
            out = subprocess.run(
                cmd, capture_output=True, text=True, timeout=1800, cwd=ROOT,
                env=env,
            )
            lines = [ln for ln in out.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if out.returncode != 0 or not lines:
                # bench.py crashed (or printed no JSON): record the actual
                # failure — return code + stderr tail — not a parse error
                # (round-2 lesson: the gpt2 kernel traceback was destroyed
                # by indexing [-1] into empty stdout)
                results[cfg["name"]] = {
                    "error": f"bench.py exited {out.returncode} with no "
                             f"JSON line",
                    "stderr_tail": out.stderr[-2000:],
                }
                print(f"   FAILED rc={out.returncode}\n"
                      f"   stderr tail: ...{out.stderr[-500:]}", flush=True)
            else:
                results[cfg["name"]] = json.loads(lines[-1])
                print(f"   {lines[-1]}", flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            err = {"error": f"{type(e).__name__}: {e}"[:500]}
            stderr = getattr(e, "stderr", None)  # TimeoutExpired carries it
            if stderr:
                if isinstance(stderr, bytes):
                    stderr = stderr.decode("utf-8", "replace")
                err["stderr_tail"] = stderr[-2000:]
            results[cfg["name"]] = err
            print(f"   FAILED: {err['error']}", flush=True)
        results[cfg["name"]]["wall_s_total"] = round(time.time() - t0, 1)
        # persist after EVERY config: compiles through the axon tunnel cost
        # 10+ min per program, so a timeout mid-matrix must not lose the
        # configs that already ran
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)

    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
