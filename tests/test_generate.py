"""Engine generation loop + sampling parity tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from vsim_tpu.engine.generate import InferenceEngine
from vsim_tpu.engine.sampling import SamplingParams, sample_jax, sample_np
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params
from vsim_tpu.models.transformer import forward, init_cache

CFG = ModelConfig(
    arch="gptneox", n_vocab=128, n_ctx=64, n_embd=64, n_head=4,
    n_layer=2, n_ff=128, n_rot=8,
)


@pytest.fixture(scope="module")
def engine():
    params = init_params(CFG, seed=0, quantize=True, scale_dtype=np.float32)
    return InferenceEngine(CFG, params)


def test_greedy_stream_matches_return_logits(engine):
    """Greedy decode must follow argmax of the --return_logits logits chain
    (reference: vsim.cpp:827-873 greedy parity mode)."""
    prompt = [1, 2, 3, 4, 5]
    res = engine.generate(prompt, n_predict=8, sampling=SamplingParams(greedy=True))
    assert len(res.token_ids) == 8

    # replay: extend the prompt token by token, check argmax chain
    ids = list(prompt)
    for tok in res.token_ids:
        lg = engine.generate(ids, n_predict=0, return_logits=True).logits
        assert int(np.argmax(lg[-1])) == tok
        ids.append(tok)


def test_return_logits_shape(engine):
    prompt = [1, 2, 3]
    res = engine.generate(prompt, n_predict=0, return_logits=True)
    assert res.logits.shape == (3, CFG.n_vocab)
    assert res.token_ids == []


def test_streaming_hook_and_stop(engine):
    seen = []
    res = engine.generate(
        [1, 2, 3], n_predict=20, sampling=SamplingParams(greedy=True),
        streaming_token_hook=seen.append,
    )
    assert seen == res.token_ids


def test_seeded_sampling_reproducible(engine):
    sp = SamplingParams(seed=42, temperature=0.85, top_k=20, top_p=0.95)
    a = engine.generate([1, 2, 3], n_predict=10, sampling=sp)
    b = engine.generate([1, 2, 3], n_predict=10, sampling=sp)
    assert a.token_ids == b.token_ids


def test_prefill_padding_invariance(engine):
    """Bucketed prefill padding must not change the logits chain."""
    sp = SamplingParams(greedy=True)
    # lengths straddling the bucket boundary (16)
    for n in (15, 16, 17):
        prompt = list(range(1, n + 1))
        res = engine.generate(prompt, n_predict=4, sampling=sp)
        lg = engine.generate(prompt, n_predict=0, return_logits=True).logits
        assert res.token_ids[0] == int(np.argmax(lg[-1]))


def test_sample_np_matches_sample_jax_topk_topp():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((1, 128)).astype(np.float32) * 3
    sp = SamplingParams(temperature=0.8, top_k=12, top_p=0.9,
                        repeat_penalty=1.3)
    last = [5, 9, 9, 100]
    # compare the *distributions* by checking the candidate sets + probs:
    # reconstruct np-side candidates
    # (full distribution check: run many draws and compare supports)
    draws_np = {
        sample_np(logits[0], last, sp, np.random.default_rng(s))
        for s in range(200)
    }
    import jax

    window = np.full((1, 8), -1, np.int32)
    for t in last:
        window = np.concatenate([window[:, 1:], [[t]]], axis=1)
    draws_jax = {
        int(
            sample_jax(
                jnp.asarray(logits), jnp.asarray(window), jax.random.PRNGKey(s),
                top_k=sp.top_k, top_p=sp.top_p, temperature=sp.temperature,
                repeat_penalty=sp.repeat_penalty,
            )[0]
        )
        for s in range(200)
    }
    # same support set (both truncated to identical top-k/top-p candidates)
    assert draws_jax <= draws_np or draws_np <= draws_jax


def test_greedy_ignores_seed(engine):
    a = engine.generate([7, 8], n_predict=5, sampling=SamplingParams(greedy=True, seed=1))
    b = engine.generate([7, 8], n_predict=5, sampling=SamplingParams(greedy=True, seed=2))
    assert a.token_ids == b.token_ids


def test_eos_stop():
    params = init_params(CFG, seed=0, quantize=False)
    eng = InferenceEngine(CFG, params)
    res = eng.generate(
        [1, 2, 3], n_predict=30, sampling=SamplingParams(greedy=True),
        stop_tokens=range(128),  # every token is EOS → stop after 1
    )
    assert len(res.token_ids) == 1


def test_stop_mid_stream_discards_inflight_chunks():
    """A stop token found while later chunks are in flight must NOT leak
    those chunks' speculative tokens into the output (ADVICE r3 high:
    drain() of chunk k+1 kept emitting after chunk k stopped)."""
    params = init_params(CFG, seed=0, quantize=False)
    eng = InferenceEngine(CFG, params, decode_chunk=4)
    # find the greedy continuation, then stop on its 2nd generated token —
    # with chunk=4 and n_predict spanning several chunks, chunk k+1 is
    # already dispatched when the stop is discovered during drain
    free = eng.generate([1, 2, 3], n_predict=16,
                        sampling=SamplingParams(greedy=True))
    stop_tok = free.token_ids[1]
    expected = free.token_ids[: free.token_ids.index(stop_tok) + 1]
    res = eng.generate([1, 2, 3], n_predict=16,
                       sampling=SamplingParams(greedy=True),
                       stop_tokens=[stop_tok])
    assert res.token_ids == expected, (
        "tokens after the stop token leaked from in-flight chunks")
    # streaming hook must see exactly the emitted tokens, nothing post-stop
    seen = []
    res2 = eng.generate([1, 2, 3], n_predict=16,
                        sampling=SamplingParams(greedy=True),
                        stop_tokens=[stop_tok],
                        streaming_token_hook=seen.append)
    assert seen == res2.token_ids == res.token_ids
