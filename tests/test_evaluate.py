"""Perplexity evaluator: windowing/masking correctness + Q4-vs-dense delta."""

import numpy as np
import pytest

from vsim_tpu.engine.evaluate import logit_delta, perplexity
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        arch="gptneox", n_vocab=128, n_ctx=16, n_embd=64, n_head=4,
        n_layer=2, n_ff=128, n_rot=8, compute_dtype="float32",
    )
    dense = init_params(cfg, seed=5, quantize=False)
    q4 = init_params(cfg, seed=5, quantize=True, scale_dtype=np.float32)
    return cfg, dense, q4


def test_windowing_invariance(setup):
    """Total NLL with window W must equal a single whole-stream window when
    the stream fits (and stay finite/positive when chunked)."""
    cfg, dense, _ = setup
    rng = np.random.default_rng(0)
    toks = rng.integers(0, cfg.n_vocab, size=15).tolist()
    whole = perplexity(cfg, dense, toks, window=16)
    assert whole["tokens"] == 14
    assert np.isfinite(whole["ppl"]) and whole["ppl"] > 0

    chunked = perplexity(cfg, dense, toks, window=8)
    assert chunked["tokens"] == 14
    # chunked ppl differs (less context at window starts) but is same scale
    assert np.isfinite(chunked["ppl"])


def test_random_model_ppl_near_vocab(setup):
    """An untrained model's ppl should be near |V| (uniform logits)."""
    cfg, dense, _ = setup
    rng = np.random.default_rng(1)
    toks = rng.integers(0, cfg.n_vocab, size=64).tolist()
    out = perplexity(cfg, dense, toks)
    assert 0.3 * cfg.n_vocab < out["ppl"] < 3 * cfg.n_vocab


def test_q4_vs_dense_delta(setup):
    cfg, dense, q4 = setup
    toks = list(range(1, 13))
    d = logit_delta(cfg, dense, cfg, q4, toks)
    assert d["max_abs"] > 0  # quantization changes logits...
    ppl_d = perplexity(cfg, dense, toks)["ppl"]
    ppl_q = perplexity(cfg, q4, toks)["ppl"]
    # ...but ppl stays the same order of magnitude (Q4 noise, not garbage)
    assert abs(np.log(ppl_q) - np.log(ppl_d)) < 1.0
    d_same = logit_delta(cfg, dense, cfg, dense, toks)
    assert d_same["max_abs"] == 0.0
    assert d_same["argmax_match"] == 1.0
