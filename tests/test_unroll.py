"""Unrolled layer loop vs lax.scan over stacked weights.

The decode hot path unrolls the layer loop at trace time over per-layer Q4
buffers (models/init.py:unstack_layer_params) so every matmul runs the flat
Pallas kernel with a static layer index — the scalar-prefetch stacked
kernel's layer-indexed tile fetches measured 1.8-3.8x slower per tile
(BASELINE.md r2).  These tests pin that the unrolled graph computes exactly
what the scan does (reference math: gptneox_eval loop, vsim.cpp:470-747).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vsim_tpu.engine.generate import InferenceEngine
from vsim_tpu.engine.sampling import SamplingParams
from vsim_tpu.models.config import PRESETS
from vsim_tpu.models.init import init_params, unstack_layer_params
from vsim_tpu.models.transformer import forward, init_cache
from vsim_tpu.quant.q4 import Q4Tensor

CFG = PRESETS["pythia-70m"].replace(n_ctx=128, kv_dtype="int8")
PARAMS = init_params(CFG, seed=0, quantize=True)
UNROLLED = unstack_layer_params(PARAMS)


def test_unstack_structure_and_bytes():
    for k, v in PARAMS["layers"].items():
        u = UNROLLED["layers"][k]
        if isinstance(v, Q4Tensor):
            assert isinstance(u, tuple) and len(u) == CFG.n_layer
            np.testing.assert_array_equal(
                np.asarray(u[3].packed), np.asarray(v.packed[3]))
            np.testing.assert_array_equal(
                np.asarray(u[3].scales), np.asarray(v.scales[3]))
        else:
            assert u is v  # small stacked arrays untouched


def test_unrolled_prefill_logits_exact():
    ids = jnp.asarray(np.arange(1, 17)[None, :], jnp.int32)
    ref, _ = forward(CFG, PARAMS, ids, init_cache(CFG, 1), 0, fresh_kv=True)
    got, _ = forward(CFG, UNROLLED, ids, init_cache(CFG, 1), 0, fresh_kv=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_unrolled_decode_steps_exact():
    # float32 cache: the unrolled graph fuses differently (1e-6-level float
    # reassociation), which an int8 cache can amplify by flipping a
    # quantization rounding at an exact .5 tie — the quantized-cache decode
    # paths are pinned by test_engine_unroll_generates_same_tokens instead
    cfg = CFG.replace(kv_dtype="float32")
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    ref_l, ref_c = forward(cfg, PARAMS, ids, init_cache(cfg, 1), 0)
    got_l, got_c = forward(cfg, UNROLLED, ids, init_cache(cfg, 1), 0)
    tok = jnp.argmax(ref_l[:, -1, :], axis=-1).astype(jnp.int32)
    for step in range(4):
        n_past = jnp.int32(8 + step)
        ref_l, ref_c = forward(cfg, PARAMS, tok[:, None], ref_c, n_past)
        got_l, got_c = forward(cfg, UNROLLED, tok[:, None], got_c, n_past)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref_l),
                                   rtol=1e-5, atol=1e-5)
        tok = jnp.argmax(ref_l[:, -1, :], axis=-1).astype(jnp.int32)


def test_unrolled_cache_free_forward():
    """Training/perplexity mode (cache=None) also supports per-layer params."""
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)
    ref, _ = forward(CFG, PARAMS, ids, None, 0)
    got, _ = forward(CFG, UNROLLED, ids, None, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("kv", ["int8", "int4"])
def test_engine_unroll_generates_same_tokens(kv):
    cfg = CFG.replace(kv_dtype=kv)
    sp = SamplingParams(greedy=True)
    eng_s = InferenceEngine(cfg, init_params(cfg, seed=0, quantize=True),
                            unroll_layers=False)
    eng_u = InferenceEngine(cfg, init_params(cfg, seed=0, quantize=True),
                            unroll_layers=True)
    assert eng_u.unrolled and not eng_s.unrolled
    prompt = [1, 2, 3, 4, 5]
    ref = eng_s.generate(prompt, n_predict=12, sampling=sp).token_ids
    got = eng_u.generate(prompt, n_predict=12, sampling=sp).token_ids
    assert ref == got


def test_random_q4_params_unstacked_matches_stacked():
    """unstacked=True emits per-layer tuples with the same rng stream shape
    semantics; fuse_qkv handles the tuple layout; forward agrees."""
    from vsim_tpu.models.init import fuse_qkv_params, random_q4_params

    cfg = PRESETS["pythia-70m"].replace(n_ctx=64, kv_dtype="float32")
    ps = random_q4_params(cfg, seed=1)
    pu = random_q4_params(cfg, seed=1, unstacked=True)
    for k, v in pu["layers"].items():
        if isinstance(v, tuple):
            assert len(v) == cfg.n_layer
    fs = fuse_qkv_params(cfg, ps)
    fu = fuse_qkv_params(cfg, pu)
    assert isinstance(fu["layers"]["w_qkv"], tuple)
    ids = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    a, _ = forward(cfg, fs, ids, init_cache(cfg, 1), 0)
    b, _ = forward(cfg, fu, ids, init_cache(cfg, 1), 0)
    # different rng consumption order -> different weights; just assert both
    # run and have sane shapes (numeric equality is covered by the
    # unstack-transform tests above)
    assert a.shape == b.shape
