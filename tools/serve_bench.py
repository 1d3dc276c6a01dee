#!/usr/bin/env python
"""Continuous-batching serving benchmark (ServingEngine) on the real TPU.

The BASELINE.md north star includes "oasst-pythia-12b INT4, continuous
batching"; this measures the serving engine end to end on a mixed workload:
staggered arrivals, mixed prompt lengths, per-request n_predict.  Reports
aggregate decoded tokens/s, time-to-first-token, and per-step latency.

Usage:
  python tools/serve_bench.py [--model gpt-j-6b] [--max-batch 16]
                              [--requests 32] [--tokens 48] [--kv int8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    from vsim_tpu.models.config import PRESETS

    ap.add_argument("--model", default="gpt-j-6b", choices=sorted(PRESETS))
    ap.add_argument("--max-batch", type=int, default=16)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--tokens", type=int, default=48)
    ap.add_argument("--kv", default="int8",
                    choices=["bfloat16", "float32", "int8", "int4"])
    ap.add_argument("--n-ctx", type=int, default=512)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--tp", type=int, default=0,
                    help="tensor-parallel degree: shard params/cache over a "
                    "(1, tp) mesh (ServingEngine mesh=)")
    ap.add_argument("--spec", action="store_true",
                    help="speculative serving: NgramDrafter in the step "
                    "(greedy verification — bit-identical output, fewer "
                    "target forwards)")
    ap.add_argument("--gamma", type=int, default=4)
    ap.add_argument("--prompt-style", default="random",
                    choices=["random", "repeat"])
    ap.add_argument("--chunk-steps", type=int, default=8,
                    help="serving steps per host round trip (step_chunk); "
                    "1 = the per-step path")
    ap.add_argument("--arrival-ms", type=float, default=0.0,
                    help="fixed inter-arrival spacing; 0 = all requests "
                    "submitted upfront (TTFT then measures wave admission, "
                    "not service latency)")
    ap.add_argument("--ckpt", default=None,
                    help="trained dense checkpoint dir (tools/train_small "
                    "format): quantize and serve REAL weights — the "
                    "speculative-acceptance measurement needs a model that "
                    "actually continues patterns (random weights cannot)")
    ap.add_argument("--cpu", action="store_true",
                    help="run on the virtual CPU device mesh (scaling-shape "
                    "check without claiming the TPU tunnel; set XLA_FLAGS="
                    "--xla_force_host_platform_device_count=N first)")
    args = ap.parse_args()

    if args.cpu:  # must precede the jax import (tests/conftest.py dance)
        os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from vsim_tpu.engine.sampling import SamplingParams
    from vsim_tpu.engine.serving import ServingEngine
    from vsim_tpu.models.init import random_q4_params

    if args.ckpt:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from train_small import quantize_params
        from vsim_tpu.convert.store import load_params

        cfg, dense = load_params(args.ckpt)
        cfg = cfg.replace(n_ctx=args.n_ctx, compute_dtype="bfloat16",
                          kv_dtype=args.kv)
        params = jax.device_put(quantize_params(dense))
        del dense
    else:
        cfg = PRESETS[args.model].replace(
            n_ctx=args.n_ctx, compute_dtype="bfloat16", kv_dtype=args.kv)
        params = jax.device_put(random_q4_params(cfg, seed=0))

    mesh = None
    if args.tp > 1:
        from vsim_tpu.parallel.mesh import make_mesh

        mesh = make_mesh((1, args.tp), devices=jax.devices()[: args.tp])

    rng = np.random.default_rng(args.seed)
    if args.prompt_style == "repeat" and args.ckpt:
        # the trained model is a byte-level LM over Python source: repeat
        # real code idioms so acceptance measures what prompt-lookup
        # delivers when the TARGET actually continues patterns (LM
        # induction) — random byte n-grams cannot show that
        phrases = [b"for i in range(10):\n    print(i)\n",
                   b"    def get(self, key):\n        return self.key\n",
                   b"x = x + 1\nx = x + 1\nx = x + 1\n",
                   b"import os\nimport sys\nimport os\nimport sys\n"]
        prompts = [list((phrases[i % len(phrases)] * 6)[:120])
                   for i in range(args.requests)]
    elif args.prompt_style == "repeat":
        # repetitive prompts (code/extractive workloads): the regime where
        # prompt-lookup drafting accepts — random-token prompts have no
        # recurring n-grams and spec serving measurably loses there
        prompts = []
        for _ in range(args.requests):
            base = list(rng.integers(1, min(cfg.n_vocab, 1000),
                                     size=int(rng.integers(3, 8))))
            reps = int(rng.integers(3, 9))
            prompts.append((base * reps)[:64])
    else:
        prompts = [
            list(rng.integers(1, min(cfg.n_vocab, 1000),
                              size=int(rng.integers(4, 65))))
            for _ in range(args.requests)
        ]

    drafter = None
    if args.spec:
        from vsim_tpu.engine.speculative import NgramDrafter

        drafter = NgramDrafter(m=3, gamma=args.gamma)
    eng = ServingEngine(cfg, params, max_batch=args.max_batch,
                        n_ctx=args.n_ctx,
                        sampling=SamplingParams(greedy=True), seed=args.seed,
                        mesh=mesh, drafter=drafter)

    # Pre-build every serving executable at construction time (prefill
    # buckets + all kv-bucket chunk steps), then prime the real path with
    # two requests.  r3's staggered TTFT p50 of 18 s was exactly this build
    # landing on the first live request (VERDICT r3 weak #4); production
    # TTFT must be admission prefill + one chunk, with the build reported
    # separately.
    build_s = eng.warmup(
        prompt_buckets=(16, 32, 64), chunk_steps=args.chunk_steps
        if args.chunk_steps > 1 else 8,
        max_len=64 + args.tokens + 2)
    t_prime0 = time.perf_counter()  # priming (real prefills + decodes) is
    # NOT build time — reported separately (ADVICE r4)
    eng.run(prompts[:2], n_predict=4, stop_tokens=())
    prime_s = time.perf_counter() - t_prime0

    t0 = time.perf_counter()
    arrivals = [i * args.arrival_ms / 1e3 for i in range(len(prompts))]
    next_up = 0
    step_times = []
    occupancy = []  # active slots entering each step (aggregate tok/s =
    # occupancy * steps/s; reported so the number is interpretable)
    chunked = args.chunk_steps > 1 and not args.spec
    while next_up < len(prompts) or eng._queue or eng._active:
        now = time.perf_counter() - t0
        while next_up < len(prompts) and arrivals[next_up] <= now:
            eng.submit(prompts[next_up], args.tokens, stop_tokens=())
            next_up += 1
        if not (eng._queue or eng._active):
            time.sleep(max(arrivals[next_up] - now, 0.0))
            continue
        occupancy.append(len(eng._active) + min(len(eng._queue),
                                                len(eng._free)))
        t1 = time.perf_counter()
        if chunked:
            eng.step_chunk(args.chunk_steps)
        else:
            eng.step()
        dt = time.perf_counter() - t1
        step_times.append(dt / (args.chunk_steps if chunked else 1))
    wall = time.perf_counter() - t0

    reqs = list(eng._results.values())
    n_tok = sum(len(r.generated) for r in reqs)
    ttft = sorted(r.first_token_s - r.submitted_s for r in reqs)
    result = {
        "metric": f"serving_tokens_per_s_{args.model.replace('-', '_')}",
        "value": round(n_tok / wall, 3),
        "unit": "tokens/s/chip",
        "extra": {
            "model": args.model,
            "kv_dtype": args.kv,
            "max_batch": args.max_batch,
            "requests": args.requests,
            "tokens_per_request": args.tokens,
            "total_tokens": n_tok,
            "wall_s": round(wall, 3),
            "ttft_p50_s": round(ttft[len(ttft) // 2], 4),
            "ttft_p99_s": round(ttft[min(len(ttft) - 1,
                                         int(len(ttft) * 0.99))], 4),
            "step_ms_p50": round(
                1e3 * float(np.median(step_times)), 3),
            "prebuild_s": round(build_s, 2),
            "prime_s": round(prime_s, 2),
            "avg_active_slots": round(float(np.mean(occupancy)), 2)
            if occupancy else 0.0,
            "tp": args.tp or 1,
            "chunk_steps": args.chunk_steps if chunked else 1,
            "device": str(jax.devices()[0]),
        },
    }
    if args.spec:
        # a PLAIN batched step also yields one token per active slot per
        # forward, so the spec win is tokens-per-slot-per-forward > 1
        per_slot = eng.spec_emitted / max(eng.spec_cycles, 1) / max(
            min(args.max_batch, args.requests), 1)
        result["extra"]["spec"] = {
            "gamma": args.gamma,
            "cycles": eng.spec_cycles,
            "emitted": eng.spec_emitted,
            "tokens_per_forward_per_slot": round(per_slot, 3),
        }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
