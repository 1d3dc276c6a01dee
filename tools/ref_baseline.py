#!/usr/bin/env python
"""Measure the REFERENCE binary's own baselines: tokens/s + INT4 ppl delta.

SURVEY.md §6 requires BASELINE.md to carry "reference CPU tokens/s measured
by us (via monitor output)", and BASELINE.md's quality clause is "ppl Δ vs
fp16 within the reference INT4 delta" — both need the *reference side* of
the comparison, never recorded before round 3 (VERDICT r2 missing #1/#2).

This container has no pretrained checkpoints, so the subject model is the
framework-trained 25M byte-level GPT-NeoX (tools/train_small.py,
/tmp/minipythia) — the same weights PPL.json measures our side on:

  1. build the reference binary (same X11-stubbed recipe as
     tests/test_reference_binary.py) if missing;
  2. export the trained checkpoint to reference ggml files, f32 and Q4_0
     (magic/hparams/byte-vocab/tensor records the reference loader reads,
     vsim.cpp:108-458);
  3. PERF: run the golden-config generation (Makefile-ubuntu:26 sampling
     flags) on both files, parse the monitor report (T_PREDICT row,
     monitor.c:182-194, printed by vsim.cpp:903-905) → tokens/s;
  4. QUALITY: teacher-forced NLL over held-out byte windows via
     ``--return_logits -b 0``: with batch 0 every loop iteration evaluates
     exactly one token, so printed line j is the prediction for token j
     (vsim.cpp:866-873; line 0 is the {1,2,3,4,5} warmup's logits,
     vsim.cpp:793 — skipped).  The f32-vs-Q4_0 ppl gap is the reference's
     OWN INT4 delta.

Writes REF_BASELINE.json.  CPU-only: run with JAX_PLATFORMS=cpu (safe next
to a TPU benchmark; the binary never touches jax).

Usage:
  JAX_PLATFORMS=cpu python tools/ref_baseline.py \
      [--ckpt /tmp/minipythia] [--windows 8] [--win-len 256]
"""
from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

import numpy as np

REF = "/root/reference"
BUILD = "/tmp/vsim_ref_build"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

XSTUB = """
void x11_open(int v) {(void)v;}
void x11_close(void) {}
void x11_update(void) {}
int  x11_checkevent(void) {return 0;}
void x11_softu(int id, void *p) {(void)id;(void)p;}
void x11_softu64_dist(double a, double b) {(void)a;(void)b;}
void x11_vector_add(double x, double y) {(void)x;(void)y;}
void x11_vector_clear(void) {}
void x11_vector_update(void) {}
void BGR_to_X(int id, void *p) {(void)id;(void)p;}
void FP_to_X(int id, void *f, int m) {(void)id;(void)f;(void)m;}
void BOX_to_X(int id, int r, int c, int n) {(void)id;(void)r;(void)c;(void)n;}
"""


def build_binary() -> str:
    binary = os.path.join(BUILD, "vsim-ubuntu")
    if os.path.exists(binary):
        return binary
    if not os.path.isdir(REF):
        raise SystemExit("reference tree not available")
    shutil.rmtree(BUILD, ignore_errors=True)
    shutil.copytree(REF, BUILD)
    with open(os.path.join(BUILD, "xstub.c"), "w") as f:
        f.write(XSTUB)
    mk = os.path.join(BUILD, "Makefile-ubuntu")
    text = open(mk).read()
    text = text.replace("xdisp.o", "xstub.o").replace("-lX11 -lXext ", "")
    open(mk, "w").write(text)
    r = subprocess.run(["make", "-f", "Makefile-ubuntu"], cwd=BUILD,
                       capture_output=True, timeout=600)
    if r.returncode != 0 or not os.path.exists(binary):
        raise SystemExit(f"reference build failed: {r.stderr[-400:]!r}")
    return binary


def export_checkpoint(ckpt: str, out_f32: str, out_q4: str) -> dict:
    """Trained dense checkpoint dir → reference ggml files (f32 + Q4_0)."""
    from vsim_tpu.convert.ggml_file import (
        _GGML_NAME_MAPS, FTYPE_F32, FTYPE_Q4_0, GGMLTensor, write_ggml)
    from vsim_tpu.quant.q4 import quantize_q4_0_np, to_ggml_q4_0_bytes

    with open(os.path.join(ckpt, "manifest.json")) as f:
        cfg = json.load(f)["config"]

    def leaf(name):
        return np.load(os.path.join(ckpt, name.replace("/", "__") + ".npy"))

    names = _GGML_NAME_MAPS["gptneox"]
    slots = [("wte", leaf("wte"))]
    L = cfg["n_layer"]
    lw = {k: leaf(f"layers/{k}") for k in
          ("ln1_w", "ln1_b", "ln2_w", "ln2_b", "wq", "bq", "wk", "bk",
           "wv", "bv", "wo", "bo", "w_fc", "b_fc", "w_proj", "b_proj")}
    per_layer = [(k, i) for i in range(L) for k in lw]
    slots += [(k, lw[k][i], i) for k, i in per_layer]
    slots += [("ln_f_w", leaf("ln_f_w")), ("ln_f_b", leaf("ln_f_b")),
              ("lm_head", leaf("lm_head"))]

    def tensors(quantize: bool):
        out = []
        for rec in slots:
            slot, data = rec[0], np.asarray(rec[1], np.float32)
            name = names[slot].format(i=rec[2]) if len(rec) == 3 else names[slot]
            if quantize and data.ndim == 2 and data.shape[-1] % 32 == 0:
                packed, scales = quantize_q4_0_np(data, scale_dtype=np.float32)
                out.append(GGMLTensor(name, data.shape, FTYPE_Q4_0,
                                      to_ggml_q4_0_bytes(packed, scales)))
            else:
                out.append(GGMLTensor(
                    name, data.shape, FTYPE_F32,
                    np.ascontiguousarray(data).view(np.uint8).reshape(-1)))
        return out

    vocab = [bytes([i]) for i in range(cfg["n_vocab"])]  # byte-level model
    for path, quantize in ((out_f32, False), (out_q4, True)):
        hp = {
            "n_vocab": cfg["n_vocab"], "n_embd": cfg["n_embd"],
            "n_head": cfg["n_head"], "n_layer": L, "n_rot": cfg["n_rot"],
            "use_parallel_residual": int(cfg["parallel_residual"]),
            "ftype": 2 if quantize else 0,
        }
        write_ggml(path, "gptneox", hp, vocab, tensors(quantize))
    return cfg


def run_binary(binary, model, prompt_ids, extra, timeout=1800):
    cmd = [binary, "gptneox", "-m", model,
           "--prompt", " ".join(str(t) for t in prompt_ids)] + extra
    t0 = time.time()
    r = subprocess.run(cmd, capture_output=True, timeout=timeout)
    assert r.returncode == 0, (cmd, r.stderr[-500:])
    return r.stdout.decode(), time.time() - t0


def monitor_seconds(out: str, slot: str) -> float:
    """Thread-0 seconds of a monitor row (monitor.c print_sep format)."""
    m = re.search(rf"^\s*{re.escape(slot)}\s*:\s*([0-9.]+)s", out, re.M)
    assert m, f"monitor row {slot} not found"
    return float(m.group(1))


def perf_run(binary, model, prompt_ids, n_predict, threads):
    """Golden-config generation (Makefile-ubuntu:26 sampling flags)."""
    out, wall = run_binary(binary, model, prompt_ids, [
        "-s", "42", "-t", str(threads), "-n", str(n_predict),
        "--top_k", "20", "--top_p", "0.95", "--temp", "0.85",
        "--repeat_last_n", "64", "--repeat_penalty", "1.3"])
    m = re.search(r"<\|BEGIN>(.*?)<END\|>", out, re.DOTALL)
    n_stream = len(m.group(1).split()) if m else 0
    n_gen = max(n_stream - len(prompt_ids), 1)  # EOS may stop early
    t_predict = monitor_seconds(out, "T_PREDICT")
    t_sample = monitor_seconds(out, "T_SAMPLE")
    return {
        "tokens_generated": n_gen,
        "t_predict_s": t_predict,
        "t_sample_s": t_sample,
        "wall_s": round(wall, 2),
        # T_PREDICT wraps every gptneox_eval: the prompt batch + one eval
        # per generated token (vsim.cpp:806); with an 8-token prompt the
        # prompt share is <2% here
        "tokens_per_s": round(n_gen / t_predict, 3) if t_predict else None,
        "ms_per_token": round(1e3 * t_predict / n_gen, 2),
    }


def window_nll(binary, model, window):
    """Teacher-forced NLL via --return_logits -b 0.

    Alignment (verified by per-line correlation against our forward,
    corr 1.0000 at the exact index): printed line j is the prediction for
    token j+1, i.e. logits after evaluating tokens[0..j] — so line j scores
    target window[j+1]."""
    out, _ = run_binary(binary, model, window,
                        ["--return_logits", "-b", "0", "--threads", "1"])
    lines = [ln for ln in out.splitlines() if ln.strip().startswith("logits:")]
    T = len(window)
    assert len(lines) >= T - 1, (len(lines), T)
    nll, n = 0.0, 0
    for j in range(0, T - 1):
        row = np.asarray(
            [float(x) for x in
             lines[j].replace("<END|>", "").split()[1:]], np.float64)
        row -= row.max()
        logp = row - np.log(np.exp(row).sum())
        nll += -logp[window[j + 1]]
        n += 1
    return nll, n


def ours_nll(ckpt: str, windows) -> dict:
    """Our framework's teacher-forced NLL on the SAME windows (CPU), so
    "ppl Δ within the reference INT4 delta" compares identical data: f32,
    Q4_0 weights, and Q4_0 weights+activations (the reference's INIT-phase
    activation quantization, ggml.c:5030-5038)."""
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from train_small import quantize_params
    from vsim_tpu.convert.store import load_params
    from vsim_tpu.models.transformer import forward_nocache

    cfg, params = load_params(ckpt)
    cfg = cfg.replace(compute_dtype="float32")
    qparams = quantize_params(params)
    ids = jnp.asarray(windows, jnp.int32)  # [W, T]

    def ppl(cfg, p):
        logits = np.asarray(forward_nocache(cfg, p, ids), np.float64)
        row = logits[:, :-1] - logits[:, :-1].max(-1, keepdims=True)
        logp = row - np.log(np.exp(row).sum(-1, keepdims=True))
        tgt = np.asarray(windows)[:, 1:]
        nll = -np.take_along_axis(logp, tgt[..., None], axis=-1)
        return float(np.exp(nll.mean()))

    out = {
        "f32": round(ppl(cfg, params), 4),
        "q4_0": round(ppl(cfg, qparams), 4),
        "q4_0_act_quant": round(ppl(cfg.replace(act_quant=True), qparams), 4),
    }
    out["delta_q4_vs_f32"] = round(out["q4_0"] - out["f32"], 4)
    out["delta_q4aq_vs_f32"] = round(out["q4_0_act_quant"] - out["f32"], 4)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="/tmp/minipythia")
    ap.add_argument("--out", default=os.path.join(ROOT, "REF_BASELINE.json"))
    ap.add_argument("--windows", type=int, default=8)
    ap.add_argument("--win-len", type=int, default=256)
    ap.add_argument("--n-predict", type=int, default=100)
    ap.add_argument("--skip-ppl", action="store_true")
    args = ap.parse_args()

    binary = build_binary()
    f32_bin = "/tmp/ref_mini_f32.bin"
    q4_bin = "/tmp/ref_mini_q4.bin"
    cfg = export_checkpoint(args.ckpt, f32_bin, q4_bin)
    print(f"exported {f32_bin} ({os.path.getsize(f32_bin)/1e6:.1f} MB), "
          f"{q4_bin} ({os.path.getsize(q4_bin)/1e6:.1f} MB)", flush=True)

    from train_small import build_corpus

    _, eval_bytes = build_corpus()
    # windows from held-out bytes; byte 2 is the reference EOS
    # (vsim.cpp:894) — skip windows containing it
    windows, pos = [], 0
    while len(windows) < args.windows and pos + args.win_len < len(eval_bytes):
        w = [int(b) for b in eval_bytes[pos: pos + args.win_len]]
        pos += args.win_len
        if 2 not in w:
            windows.append(w)

    result = {
        "model": {
            "params": "25M trained byte-level GPT-NeoX (tools/train_small.py)",
            **{k: cfg[k] for k in
               ("n_vocab", "n_embd", "n_head", "n_layer", "n_ff", "n_rot")},
        },
        "binary": "vsim-ubuntu (Makefile-ubuntu, X11 stubbed; the pure-CPU "
                  "build — mul_mat runs the scalar Q4 dot, imax.c:1182-1230)",
        "golden_flags": "seed 42, top_k 20, top_p 0.95, temp 0.85, "
                        "repeat 64/1.3 (Makefile-ubuntu:26)",
    }

    prompt = windows[0][:8] if windows else [1, 3, 4, 5, 9, 7, 11, 13]
    print("== perf (golden config) ==", flush=True)
    result["perf"] = {}
    result["perf_note"] = (
        "threads=1 only (the golden config's value, Makefile-ubuntu:26): "
        "this container has 2 cores and the reference thread pool spin-waits "
        "(ggml.c:8197-8243), so multi-thread numbers here measure scheduler "
        "thrash, not the engine")
    for tag, model in (("q4_0", q4_bin), ("f32", f32_bin)):
        for threads in (1,):
            r = perf_run(binary, model, prompt, args.n_predict, threads)
            result["perf"][f"{tag}_t{threads}"] = r
            print(f"  {tag} threads={threads}: {r['tokens_per_s']} tok/s "
                  f"({r['ms_per_token']} ms/tok, predict {r['t_predict_s']}s)",
                  flush=True)

    if not args.skip_ppl:
        print("== ppl (teacher-forced, held-out stdlib bytes) ==", flush=True)
        ppl = {}
        for tag, model in (("f32", f32_bin), ("q4_0", q4_bin)):
            tot, n = 0.0, 0
            for i, w in enumerate(windows):
                nll, cnt = window_nll(binary, model, w)
                tot += nll
                n += cnt
                print(f"  {tag} window {i}: ppl so far "
                      f"{np.exp(tot / n):.4f} ({n} positions)", flush=True)
            ppl[tag] = {"ppl": round(float(np.exp(tot / n)), 4),
                        "nll": round(tot / n, 6), "positions": n}
        ppl["delta_q4_vs_f32"] = round(ppl["q4_0"]["ppl"] - ppl["f32"]["ppl"], 4)
        ppl["delta_pct"] = round(
            100 * (ppl["q4_0"]["ppl"] / ppl["f32"]["ppl"] - 1), 3)
        result["ppl_reference"] = ppl
        print("== ours, same windows ==", flush=True)
        result["ppl_ours_same_windows"] = ours_nll(args.ckpt, windows)
        print(f"  {result['ppl_ours_same_windows']}", flush=True)

    # preserve rows other tools contribute (e.g. the flagship-scale 12B
    # perf row from tools/ref_baseline_12b.py)
    if os.path.exists(args.out):
        with open(args.out) as f:
            old = json.load(f)
        for k, v in old.get("perf", {}).items():
            result.setdefault("perf", {}).setdefault(k, v)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
