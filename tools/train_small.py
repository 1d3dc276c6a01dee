#!/usr/bin/env python
"""Train a small byte-level GPT-NeoX with the framework, then measure the
Q4_0 quantization perplexity delta on REAL (trained) weights.

BASELINE.md's quality north star is "ppl Δ vs fp16 within the reference INT4
delta", but this container has no network and no pretrained checkpoints
(verified: no HF cache, DNS fails), so the only way to get non-random weights
is to train them.  This tool:

  1. builds a byte-level corpus from the Python stdlib sources on disk
     (deterministic file list; held-out files for eval),
  2. trains a 25M-param GPT-NeoX (E=512, L=8, H=8, n_rot=16, parallel
     residual — a mini pythia) with the framework's own forward
     (models/transformer.py cache-free path) + optax AdamW on the TPU,
  3. saves the dense checkpoint (convert/store.py),
  4. measures held-out perplexity for: f32 dense, bf16 compute, Q4_0
     weights, and Q4_0 weights + Q4_0 activations (the reference's INIT-phase
     activation quantization, ggml.c:5030-5038).

The resulting table is the framework's recorded quantization-quality
baseline (BASELINE.md).  Reference anchor: the reference has no ppl harness
at all — its quality check is --return_logits HF parity (vsim.cpp:827-873).

Usage:
  python tools/train_small.py --steps 3000 --out /tmp/minipythia
  python tools/train_small.py --eval-only --out /tmp/minipythia
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# this container's sitecustomize force-registers the axon TPU tunnel over
# JAX_PLATFORMS — and the tunnel is SINGLE-CLIENT, so merely importing jax
# serializes this process against any running benchmark.  Honor an explicit
# cpu request fully: drop the tunnel registration BEFORE the import (same
# dance as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params
from vsim_tpu.models.transformer import forward_nocache
from vsim_tpu.quant.q4 import Q4Tensor

CFG = ModelConfig(
    arch="gptneox", n_vocab=256, n_ctx=512, n_embd=512, n_head=8,
    n_layer=8, n_ff=2048, n_rot=16, compute_dtype="bfloat16",
)


def build_corpus(max_bytes: int = 12_000_000):
    """Byte corpus from the Python stdlib on disk.  Every 17th file (sorted
    order) is held out for eval, so eval text is unseen files, not a tail
    split of seen ones."""
    import sysconfig

    stdlib = sysconfig.get_paths()["stdlib"]
    files = []
    for root, dirs, names in os.walk(stdlib):
        if "site-packages" in root or "test" in root.split(os.sep):
            continue
        for n in sorted(names):
            if n.endswith(".py"):
                files.append(os.path.join(root, n))
    files.sort()
    train, evl = [], []
    tb = eb = 0
    for i, fn in enumerate(files):
        try:
            data = open(fn, "rb").read()
        except OSError:
            continue
        if i % 17 == 0:
            if eb < max_bytes // 20:
                evl.append(data)
                eb += len(data)
        elif tb < max_bytes:
            train.append(data)
            tb += len(data)
    train_b = np.frombuffer(b"\n".join(train), np.uint8)
    eval_b = np.frombuffer(b"\n".join(evl), np.uint8)
    return train_b, eval_b


def make_train_step(cfg, tx):
    import optax  # noqa: F401

    def loss_fn(params, ids):
        logits = forward_nocache(cfg, params, ids)  # [B, T, V] f32
        logp = jax.nn.log_softmax(logits[:, :-1], axis=-1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return nll.mean()

    @jax.jit
    def step(params, opt_state, ids):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = jax.tree.map(
            lambda p, u: p + u.astype(p.dtype), params, updates)
        return params, opt_state, loss

    return step


def quantize_params(params):
    """Dense trained pytree → Q4_0 pytree (same set the reference quantizer
    takes: every 2D ``.*weight`` incl. embeddings, quantize_gptneox.cpp:
    171-185; stacked [L,O,K] handled per layer)."""
    out = dict(params)
    layers = dict(params["layers"])
    for k, v in layers.items():
        if not isinstance(v, jnp.ndarray) or v.ndim != 3:
            continue
        qs = [Q4Tensor.from_dense_np(np.asarray(v[i], np.float32))
              for i in range(v.shape[0])]
        layers[k] = Q4Tensor(
            packed=jnp.stack([q.packed for q in qs]),
            scales=jnp.stack([q.scales for q in qs]),
        )
    out["layers"] = layers
    for k in ("wte", "lm_head"):
        v = params[k]
        if isinstance(v, jnp.ndarray) and v.ndim == 2:
            out[k] = jax.device_put(
                Q4Tensor.from_dense_np(np.asarray(v, np.float32)))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--out", default="/tmp/minipythia")
    ap.add_argument("--eval-only", action="store_true")
    ap.add_argument("--eval-tokens", type=int, default=200_000)
    args = ap.parse_args()

    import optax

    from vsim_tpu.convert.store import load_params, save_params
    from vsim_tpu.engine.evaluate import perplexity

    print(f"device={jax.devices()[0].device_kind}", flush=True)
    train_b, eval_b = build_corpus()
    print(f"corpus: train={train_b.size/1e6:.1f}MB eval={eval_b.size/1e6:.1f}MB",
          flush=True)

    cfg = CFG
    if args.eval_only:
        cfg_l, params = load_params(args.out)
        cfg = cfg_l.replace(compute_dtype="bfloat16")
    else:
        params = init_params(cfg, seed=0, param_dtype=jnp.float32)
        params = jax.device_put(params)
        warmup = min(100, max(1, args.steps // 10))
        sched = optax.warmup_cosine_decay_schedule(
            0.0, args.lr, warmup_steps=warmup,
            decay_steps=max(args.steps, warmup + 1),
            end_value=args.lr * 0.1)
        tx = optax.chain(optax.clip_by_global_norm(1.0),
                         optax.adamw(sched, weight_decay=0.01))
        opt_state = tx.init(params)
        step = make_train_step(cfg, tx)

        rng = np.random.default_rng(0)
        T = cfg.n_ctx
        t0 = time.time()
        loss = None
        for i in range(args.steps):
            starts = rng.integers(0, train_b.size - T - 1, args.batch)
            ids = np.stack([train_b[s:s + T + 1] for s in starts])
            params, opt_state, loss = step(
                params, opt_state, jnp.asarray(ids[:, :T + 1], jnp.int32))
            if i % 200 == 0 or i == args.steps - 1:
                print(f"step {i:5d} loss {float(loss):.4f} "
                      f"({time.time()-t0:.0f}s)", flush=True)
        save_params(args.out, cfg, params)
        print(f"saved to {args.out}", flush=True)

    toks = eval_b[: args.eval_tokens].astype(np.int32)
    results = {}
    for name, (cfg_e, p) in {
        "f32": (cfg.replace(compute_dtype="float32"), params),
        "bf16": (cfg, params),
        "q4": (cfg.replace(compute_dtype="float32"), quantize_params(params)),
        "q4_act_quant": (
            cfg.replace(compute_dtype="float32", act_quant=True),
            None,  # filled below — reuse the q4 params
        ),
    }.items():
        if p is None:
            p = results["q4"]["params"]
        t0 = time.time()
        r = perplexity(cfg_e, p, toks)
        results[name] = {"ppl": r["ppl"], "params": p}
        print(f"{name:14s} ppl={r['ppl']:.4f}  "
              f"({r['tokens']} toks, {time.time()-t0:.0f}s)", flush=True)

    table = {k: round(v["ppl"], 4) for k, v in results.items()}
    table["delta_q4_vs_f32"] = round(table["q4"] - table["f32"], 4)
    table["delta_q4aq_vs_f32"] = round(table["q4_act_quant"] - table["f32"], 4)
    with open(os.path.join(args.out, "ppl.json"), "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table), flush=True)


if __name__ == "__main__":
    main()
