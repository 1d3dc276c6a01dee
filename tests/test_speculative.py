"""Speculative decoding: greedy output must be BIT-IDENTICAL to plain
greedy decoding (engine/speculative.py) — only the number of target
forwards changes.  This preserves the reference's greedy parity surface
(--return_logits / golden token streams, vsim.cpp:827-873)."""

import numpy as np
import pytest

from vsim_tpu.engine.generate import InferenceEngine
from vsim_tpu.engine.sampling import SamplingParams
from vsim_tpu.engine.speculative import (
    ModelDrafter,
    NgramDrafter,
    SpeculativeEngine,
)
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params

CFG = ModelConfig(
    arch="gptneox", n_vocab=128, n_ctx=128, n_embd=64, n_head=4,
    n_layer=2, n_ff=128, n_rot=8,
)
DRAFT_CFG = ModelConfig(
    arch="gptneox", n_vocab=128, n_ctx=128, n_embd=32, n_head=2,
    n_layer=1, n_ff=64, n_rot=8,
)


@pytest.fixture(scope="module")
def params():
    return init_params(CFG, seed=0, quantize=True, scale_dtype=np.float32)


@pytest.fixture(scope="module")
def plain(params):
    return InferenceEngine(CFG, params)


def _greedy(plain, prompt, n):
    return plain.generate(
        prompt, n_predict=n, sampling=SamplingParams(greedy=True)
    ).token_ids


def test_self_draft_exact_and_fully_accepted(params, plain):
    """Target drafting for itself: every draft accepted (gamma+1 tokens per
    cycle), stream identical to plain greedy."""
    drafter = ModelDrafter(CFG, params, gamma=3)
    eng = SpeculativeEngine(CFG, params, drafter)
    prompt = [1, 2, 3, 4, 5]
    res = eng.generate(prompt, n_predict=16)
    assert res.token_ids == _greedy(plain, prompt, 16)
    # self-draft is perfect: gamma+1 tokens per verify cycle
    assert res.tokens_per_cycle > drafter.gamma * 0.9


def test_weak_draft_still_exact(params, plain):
    """A random unrelated draft model (low acceptance) must not change the
    output stream — only slow it down."""
    dparams = init_params(DRAFT_CFG, seed=7, quantize=False)
    drafter = ModelDrafter(DRAFT_CFG, dparams, gamma=4)
    eng = SpeculativeEngine(CFG, params, drafter)
    prompt = [9, 8, 7]
    res = eng.generate(prompt, n_predict=12)
    assert res.token_ids == _greedy(plain, prompt, 12)


def test_ngram_draft_exact(params, plain):
    drafter = NgramDrafter(m=2, gamma=4)
    eng = SpeculativeEngine(CFG, params, drafter)
    # repetitive prompt gives the n-gram drafter something to match
    prompt = [5, 6, 7, 5, 6, 7, 5, 6]
    res = eng.generate(prompt, n_predict=16)
    assert res.token_ids == _greedy(plain, prompt, 16)


def test_ngram_accepts_on_repetitive_stream(params):
    """Greedy decode of a tiny random model often enters a cycle; the n-gram
    drafter must then accept >1 token/cycle on average."""
    drafter = NgramDrafter(m=2, gamma=4)
    eng = SpeculativeEngine(CFG, params, drafter)
    prompt = [3, 3, 3, 3]
    res = eng.generate(prompt, n_predict=32)
    assert len(res.token_ids) == 32
    assert res.cycles >= 1


def test_eos_trim(params, plain):
    drafter = ModelDrafter(CFG, params, gamma=2)
    eng = SpeculativeEngine(CFG, params, drafter)
    exact = _greedy(plain, [1, 2], 20)
    eos = exact[5]  # force a stop mid-stream
    res = eng.generate([1, 2], n_predict=20, stop_tokens=[eos])
    want = exact[: exact.index(eos) + 1]
    assert res.token_ids == want


def test_gamma_one(params, plain):
    drafter = ModelDrafter(CFG, params, gamma=1)
    eng = SpeculativeEngine(CFG, params, drafter)
    prompt = [11, 12, 13]
    assert eng.generate(prompt, n_predict=9).token_ids == _greedy(
        plain, prompt, 9)
