"""int8-quantized KV cache vs full-precision cache.

The reference's cache is always f32 (vsim.cpp:349-366); this framework makes
the dtype configurable and adds per-(token, head) int8 quantization
(models/transformer.py:_kv_quantize) to halve decode-step KV HBM traffic."""

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu.engine.generate import InferenceEngine
from vsim_tpu.engine.sampling import SamplingParams
from vsim_tpu.models.config import PRESETS
from vsim_tpu.models.init import random_q4_params
from vsim_tpu.models.transformer import forward, init_cache

CFG = PRESETS["pythia-70m"].replace(n_ctx=128)
PARAMS = random_q4_params(CFG, seed=0)


def _run(kv_dtype, ids, n_past=0):
    cache = init_cache(CFG, batch=ids.shape[0], dtype=kv_dtype)
    logits, cache = forward(CFG, PARAMS, ids, cache, n_past)
    return logits, cache


def test_int8_cache_structure():
    cache = init_cache(CFG, batch=2, dtype="int8")
    vals, scales = cache["k"]
    assert vals.dtype == jnp.int8
    # head-major layout: [L, B, H, S, D] (transpose-free attention reads)
    assert vals.shape == (CFG.n_layer, 2, CFG.n_head, 128, CFG.head_dim)
    assert scales.shape == (CFG.n_layer, 2, CFG.n_head, 128)


def test_int8_prefill_logits_close():
    ids = jnp.asarray(np.arange(1, 17)[None, :], jnp.int32)
    ref, _ = _run("float32", ids)
    got, _ = _run("int8", ids)
    # int8 KV error is bounded by the per-head amax/127 step
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=3e-2, atol=3e-2)


def test_int8_decode_steps_match_float():
    """Multi-step decode: prefill then 8 single-token steps; logits track the
    float cache within quantization tolerance at every step."""
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    ref_l, ref_c = _run("float32", ids)
    got_l, got_c = _run("int8", ids)
    tok = jnp.argmax(ref_l[:, -1, :], axis=-1).astype(jnp.int32)
    for step in range(8):
        n_past = jnp.int32(8 + step)
        ref_l, ref_c = forward(CFG, PARAMS, tok[:, None], ref_c, n_past)
        got_l, got_c = forward(CFG, PARAMS, tok[:, None], got_c, n_past)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                                   rtol=5e-2, atol=5e-2)
        tok = jnp.argmax(ref_l[:, -1, :], axis=-1).astype(jnp.int32)


def test_int8_engine_generates():
    eng = InferenceEngine(CFG, PARAMS, kv_dtype="int8")
    ref = InferenceEngine(CFG, PARAMS, kv_dtype="float32")
    sp = SamplingParams(greedy=True)
    got = eng.generate([1, 2, 3, 4, 5], n_predict=8, sampling=sp).token_ids
    exp = ref.generate([1, 2, 3, 4, 5], n_predict=8, sampling=sp).token_ids
    assert len(got) == 8
    # greedy streams usually agree exactly on a short horizon; require the
    # first tokens (pure prefill logits, no accumulated drift) to match
    assert got[0] == exp[0]


def test_int8_ragged_serving():
    from vsim_tpu.engine.serving import ServingEngine

    eng = ServingEngine(CFG.replace(kv_dtype="int8"), PARAMS, max_batch=2,
                        n_ctx=128)
    out = eng.run([[1, 2, 3], [4, 5, 6, 7]], n_predict=4, stop_tokens=())
    assert len(out) == 2
    for req in out.values():
        assert len(req.generated) == 4
