"""Checkpoint → Q4 quantizer CLI — replaces the reference's two-stage
convert_*_to_ggml.py + quantize_{gptj,bloom,gptneox,gpt2}.cpp pipeline with
one command:

    python -m vsim_tpu.convert.quantize <hf-model-or-path> <out-dir>
        [--dense] [--scale-dtype bfloat16|float16|float32] [--n-ctx N]

Reads a local HF checkpoint (or downloads by name when the environment has
network), converts + Q4_0-quantizes every eligible 2-D weight (the
``.*weight`` 2-D rule of quantize_gptneox.cpp:171-185), and writes the
vsim_tpu checkpoint directory.  Prints the 16-bin nibble histogram per run
like the reference quantizers (quantize_gptneox.cpp:295-327).
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model", help="HF model name or local checkpoint path")
    ap.add_argument("out", help="output checkpoint directory")
    ap.add_argument("--dense", action="store_true",
                    help="skip quantization (fp32 reference checkpoint)")
    ap.add_argument("--scale-dtype", default="bfloat16",
                    choices=["bfloat16", "float16", "float32"])
    ap.add_argument("--n-ctx", type=int, default=None)
    args = ap.parse_args(argv)

    import ml_dtypes
    from transformers import AutoModelForCausalLM

    from vsim_tpu.convert.hf import convert_hf_model
    from vsim_tpu.convert.store import save_params
    from vsim_tpu.quant.q4 import Q4Tensor

    scale_dtype = (np.dtype(ml_dtypes.bfloat16)
                   if args.scale_dtype == "bfloat16"
                   else np.dtype(args.scale_dtype))

    print(f"loading {args.model} ...", flush=True)
    model = AutoModelForCausalLM.from_pretrained(args.model)
    cfg, params = convert_hf_model(
        model, quantize=not args.dense, n_ctx=args.n_ctx,
        scale_dtype=scale_dtype,
    )

    # nibble histogram report (reference: per-tensor + aggregate,
    # quantize_gptneox.cpp:295-327 — aggregate here)
    if not args.dense:
        import jax

        hist = np.zeros(16, np.int64)
        for leaf in jax.tree.leaves(
            params, is_leaf=lambda x: isinstance(x, Q4Tensor)
        ):
            if isinstance(leaf, Q4Tensor):
                p = np.asarray(leaf.packed)
                hist += np.bincount((p & 0x0F).ravel(), minlength=16)
                hist += np.bincount((p >> 4).ravel(), minlength=16)
        total = hist.sum()
        print("nibble histogram:",
              " ".join(f"{v / max(total, 1):5.3f}" for v in hist))

    save_params(args.out, cfg, params)
    print(f"wrote {args.out} ({cfg.arch}, quantized={not args.dense})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
