"""Reference ggml wire-format round trip: export a HF model to a ggml Q4_0
file (the reference's int4_fixed_zero format) and load it back; logits must
match the direct HF→params conversion path bit-for-bit (same Q4 nibbles)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch

from vsim_tpu.convert.export_ggml import export_ggml
from vsim_tpu.convert.ggml_file import load_ggml_model, read_ggml
from vsim_tpu.convert.hf import convert_hf_model
from vsim_tpu.convert.store import load_params, save_params
from vsim_tpu.models.transformer import forward, init_cache

from test_model_parity import PROBE, _hf_model


def _logits(cfg, params, ids):
    cache = init_cache(cfg, 1, n_ctx=32, dtype=jnp.float32)
    lg, _ = forward(cfg, params, jnp.asarray([ids], jnp.int32), cache, 0)
    return np.asarray(lg[0])


@pytest.mark.parametrize("arch", ["gptneox", "gptj", "codegen", "bloom",
                                  "gpt2"])
def test_ggml_roundtrip_logits(arch, tmp_path):
    model = _hf_model(arch)
    path = str(tmp_path / "model.bin")
    export_ggml(path, model, quantize=True)

    ggml_arch = "gptj" if arch == "codegen" else arch  # CodeGen ships as GPT-J
    cfg_direct, params_direct = convert_hf_model(
        model, quantize=True, scale_dtype=np.float32)
    cfg_ggml, params_ggml, vocab = load_ggml_model(
        path, ggml_arch, n_ctx=32, scale_dtype=np.float32)

    assert cfg_ggml.arch == cfg_direct.arch
    assert cfg_ggml.n_embd == cfg_direct.n_embd
    assert cfg_ggml.n_rot == cfg_direct.n_rot
    assert len(vocab) == cfg_direct.n_vocab

    a = _logits(cfg_direct.replace(n_ctx=32), params_direct, PROBE)
    b = _logits(cfg_ggml, params_ggml, PROBE)
    if arch == "gpt2":
        # reference gpt2 files quantize Conv1D weights along the OUT axis
        # (quantize_gpt2.cpp:170 on [in, out] data); loading requantizes
        # along K, so the roundtrip adds one quantization-noise level.
        np.testing.assert_allclose(a, b, rtol=0.2, atol=0.12)
        assert (np.argmax(a, -1) == np.argmax(b, -1)).all()
    else:
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_ggml_header_fields(tmp_path):
    model = _hf_model("gptneox")
    path = str(tmp_path / "model.bin")
    export_ggml(path, model, quantize=True)
    hparams, vocab, tensors = read_ggml(path, "gptneox")
    assert hparams["n_vocab"] == 96
    assert hparams["n_embd"] == 64
    assert hparams["ftype"] == 2
    assert hparams["use_parallel_residual"] == 1
    # quantized 2-D weights carry ftype 2, 1-D stay f32
    assert tensors["gpt_neox.embed_in.weight"].ftype == 2
    assert tensors["gpt_neox.final_layer_norm.weight"].ftype == 0


def test_store_roundtrip_bf16_scales(tmp_path):
    # default scale dtype is bfloat16 — .npy writes it as void("|V2"), the
    # manifest dtype record must restore it
    model = _hf_model("gptneox")
    cfg, params = convert_hf_model(model, quantize=True)
    save_params(str(tmp_path / "ckpt"), cfg, params)
    cfg2, params2 = load_params(str(tmp_path / "ckpt"))
    assert str(params2["layers"]["wq"].scales.dtype) == "bfloat16"
    a = _logits(cfg.replace(n_ctx=32), params, PROBE)
    b = _logits(cfg2.replace(n_ctx=32), params2, PROBE)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_store_roundtrip(tmp_path):
    model = _hf_model("gptneox")
    cfg, params = convert_hf_model(model, quantize=True, scale_dtype=np.float32)
    save_params(str(tmp_path / "ckpt"), cfg, params)
    cfg2, params2 = load_params(str(tmp_path / "ckpt"))
    assert cfg2 == cfg
    a = _logits(cfg.replace(n_ctx=32), params, PROBE)
    b = _logits(cfg2.replace(n_ctx=32), params2, PROBE)
    np.testing.assert_allclose(a, b, rtol=0, atol=0)
