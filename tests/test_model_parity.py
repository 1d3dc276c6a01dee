"""Logit parity vs HuggingFace — the golden test.

Reference protocol: cformers/test_return_logits.py runs the binary with
--return_logits (greedy, full-vocab logits per position) and compares against
HF AutoModelForCausalLM logits on the probe prompt [1,2,3,4,5]
(test_return_logits.py:48-62, 80).  Here the HF model is instantiated locally
with random weights (no network), converted through our pipeline, and logits
are compared exactly for the fp32 path and via a quant-dequant-matched HF
model for the Q4 path.
"""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from vsim_tpu.convert.hf import convert_hf_model
from vsim_tpu.models.transformer import forward, init_cache
from vsim_tpu.quant.q4 import QK, dequantize_q4_0_np, quantize_q4_0_np

PROBE = [1, 2, 3, 4, 5]  # test_return_logits.py:80


def _hf_model(arch, **kw):
    torch.manual_seed(0)
    if arch == "gptneox":
        from transformers import GPTNeoXConfig, GPTNeoXForCausalLM

        cfg = GPTNeoXConfig(
            vocab_size=96, hidden_size=64, num_attention_heads=4,
            num_hidden_layers=2, intermediate_size=128, rotary_pct=0.25,
            max_position_embeddings=128, use_cache=False, **kw,
        )
        return GPTNeoXForCausalLM(cfg).eval()
    if arch == "gptj":
        from transformers import GPTJConfig, GPTJForCausalLM

        cfg = GPTJConfig(
            vocab_size=96, n_positions=128, n_embd=64, n_head=4, n_layer=2,
            rotary_dim=16, use_cache=False, **kw,
        )
        return GPTJForCausalLM(cfg).eval()
    if arch == "codegen":
        from transformers import CodeGenConfig, CodeGenForCausalLM

        cfg = CodeGenConfig(
            vocab_size=96, n_positions=128, n_embd=64, n_head=4, n_layer=2,
            rotary_dim=16, use_cache=False, **kw,
        )
        return CodeGenForCausalLM(cfg).eval()
    if arch == "bloom":
        from transformers import BloomConfig, BloomForCausalLM

        cfg = BloomConfig(
            vocab_size=96, hidden_size=64, n_head=4, n_layer=2,
            use_cache=False, **kw,
        )
        return BloomForCausalLM(cfg).eval()
    if arch == "gpt2":
        from transformers import GPT2Config, GPT2LMHeadModel

        cfg = GPT2Config(
            vocab_size=96, n_positions=64, n_embd=64, n_head=4, n_layer=2,
            use_cache=False, **kw,
        )
        return GPT2LMHeadModel(cfg).eval()
    raise ValueError(arch)


def _hf_logits(model, ids):
    with torch.no_grad():
        return model(torch.tensor([ids])).logits[0].float().numpy()


def _our_logits(cfg, params, ids, n_ctx=32):
    token_ids = jnp.asarray([ids], dtype=jnp.int32)
    cache = init_cache(cfg, batch=1, n_ctx=n_ctx, dtype=jnp.float32)
    logits, _ = forward(cfg, params, token_ids, cache, n_past=0)
    return np.asarray(logits[0])


ARCHS = ["gptneox", "gptj", "codegen", "bloom", "gpt2"]


@pytest.mark.parametrize("arch", ARCHS)
def test_fp32_logits_match_hf(arch):
    model = _hf_model(arch)
    cfg, params = convert_hf_model(model, quantize=False)
    ours = _our_logits(cfg, params, PROBE)
    theirs = _hf_logits(model, PROBE)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_gptneox_sequential_residual():
    # use_parallel_residual=0 branch (vsim.cpp:627-658)
    model = _hf_model("gptneox", use_parallel_residual=False)
    cfg, params = convert_hf_model(model, quantize=False)
    assert not cfg.parallel_residual
    ours = _our_logits(cfg, params, PROBE)
    theirs = _hf_logits(model, PROBE)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ARCHS)
def test_q4_logits_match_quantized_hf(arch):
    """Our Q4 forward == HF forward with weights replaced by their Q4_0
    quantize-dequantize images (weight-only quantization, fp32 scales)."""
    model = _hf_model(arch)
    # fake-quantize every 2-D weight in the torch model with our packer
    with torch.no_grad():
        for name, p in model.named_parameters():
            if name.endswith("weight") and p.ndim == 2:
                w = p.float().numpy()
                # HF GPT-2 Conv1D weights are [in, out]: quantize along the
                # contraction dim as our converter sees it ([out, in])
                transpose = "gpt2" in type(model).__name__.lower() and any(
                    s in name for s in ("c_attn", "c_proj", "c_fc")
                )
                if transpose:
                    w = w.T
                if w.shape[-1] % QK != 0:
                    continue
                deq = dequantize_q4_0_np(*quantize_q4_0_np(w, np.float32))
                if transpose:
                    deq = deq.T
                p.copy_(torch.from_numpy(deq))
    cfg, params = convert_hf_model(model, quantize=True, scale_dtype=np.float32)
    ours = _our_logits(cfg, params, PROBE)
    theirs = _hf_logits(model, PROBE)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("arch", ARCHS)
def test_incremental_decode_matches_full_forward(arch):
    """KV-cache correctness: feeding tokens one at a time must reproduce the
    batch-prefill logits (the reference's n_batch prompt ingest vs per-token
    decode, vsim.cpp:863-882)."""
    model = _hf_model(arch)
    cfg, params = convert_hf_model(model, quantize=True, scale_dtype=np.float32)
    ids = jnp.asarray([PROBE], dtype=jnp.int32)
    cache = init_cache(cfg, batch=1, n_ctx=16, dtype=jnp.float32)
    full_logits, _ = forward(cfg, params, ids, cache, n_past=0)

    cache = init_cache(cfg, batch=1, n_ctx=16, dtype=jnp.float32)
    step_logits = []
    for t, tok in enumerate(PROBE):
        lg, cache = forward(
            cfg, params, jnp.asarray([[tok]], jnp.int32), cache, n_past=t
        )
        step_logits.append(np.asarray(lg[0, 0]))
    np.testing.assert_allclose(
        np.asarray(full_logits[0]), np.stack(step_logits), rtol=1e-4, atol=1e-4
    )
