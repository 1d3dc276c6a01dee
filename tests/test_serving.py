"""Continuous-batching serving engine: ragged batched decode must reproduce
the single-sequence engine's greedy streams bit-for-bit, across staggered
admissions and slot reuse."""

import jax.numpy as jnp
import numpy as np
import pytest

from vsim_tpu.engine.generate import InferenceEngine
from vsim_tpu.engine.sampling import SamplingParams
from vsim_tpu.engine.serving import ServingEngine
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        arch="gptneox", n_vocab=160, n_ctx=96, n_embd=64, n_head=4,
        n_layer=2, n_ff=128, n_rot=8, kv_dtype="float32",
        compute_dtype="float32",
    )
    params = init_params(cfg, seed=3, quantize=True)
    return cfg, params


def _reference_stream(cfg, params, prompt, n):
    eng = InferenceEngine(cfg, params)
    res = eng.generate(prompt, n_predict=n, sampling=SamplingParams(greedy=True),
                       stop_tokens=())
    return res.token_ids


def test_batched_matches_single(setup):
    cfg, params = setup
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [42], [5, 4, 3, 2]]
    n = 12
    want = [_reference_stream(cfg, params, p, n) for p in prompts]

    srv = ServingEngine(cfg, params, max_batch=4)
    out = srv.run(prompts, n_predict=n, stop_tokens=())
    got = [out[i].generated for i in range(len(prompts))]
    assert got == want


def test_staggered_admission_and_slot_reuse(setup):
    cfg, params = setup
    srv = ServingEngine(cfg, params, max_batch=2)  # more prompts than slots
    prompts = [[1, 2, 3], [9, 8], [4, 5, 6, 7], [11], [3, 14, 15]]
    n = 6
    out = srv.run(prompts, n_predict=n, stop_tokens=())
    for i, p in enumerate(prompts):
        assert out[i].generated == _reference_stream(cfg, params, p, n), i


def test_mid_flight_submit(setup):
    cfg, params = setup
    srv = ServingEngine(cfg, params, max_batch=4)
    a = srv.submit([1, 2, 3], 10, stop_tokens=())
    for _ in range(4):
        srv.step()
    b = srv.submit([7, 8, 9], 10, stop_tokens=())  # joins mid-decode of a
    while srv._active or srv._queue:
        srv.step()
    ra, rb = srv._results[a], srv._results[b]
    assert ra.generated == _reference_stream(cfg, params, [1, 2, 3], 10)
    assert rb.generated == _reference_stream(cfg, params, [7, 8, 9], 10)


def test_stop_token_frees_slot(setup):
    cfg, params = setup
    # every token is a stop token -> each request finishes on its first token
    srv = ServingEngine(cfg, params, max_batch=1)
    out = srv.run([[1, 2], [3, 4]], n_predict=8,
                  stop_tokens=range(cfg.n_vocab))
    assert all(len(r.generated) == 1 for r in out.values())


def test_streaming_hook(setup):
    cfg, params = setup
    srv = ServingEngine(cfg, params, max_batch=2)
    seen = []
    srv.submit([5, 6], 5, stop_tokens=(), streaming_token_hook=seen.append)
    while srv._active or srv._queue:
        srv.step()
    req = list(srv._results.values())[0]
    assert seen == req.generated
    assert len(seen) == 5


def test_sharded_serving_matches_single_device(setup):
    """TP-sharded serving on the (1, 8) virtual mesh reproduces the
    unsharded engine's greedy streams exactly (VERDICT r1 #5)."""
    from vsim_tpu.parallel.mesh import make_mesh

    cfg, params = setup
    import jax

    mesh = make_mesh((1, 4), devices=jax.devices()[:4])
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [42]]
    n = 8
    want = [_reference_stream(cfg, params, p, n) for p in prompts]
    srv = ServingEngine(cfg, params, max_batch=4, mesh=mesh)
    out = srv.run(prompts, n_predict=n, stop_tokens=())
    got = [out[i].generated for i in range(len(prompts))]
    assert got == want


def test_speculative_serving_matches_plain(setup):
    """Spec serving (NgramDrafter in the continuous-batching step) must be
    bit-identical to the plain greedy step — only the number of target
    forwards may differ (greedy verification, engine/speculative.py)."""
    from vsim_tpu.engine.speculative import NgramDrafter

    cfg, params = setup
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [42], [5, 4, 3, 2]]
    n = 16
    want = [_reference_stream(cfg, params, p, n) for p in prompts]

    srv = ServingEngine(cfg, params, max_batch=4,
                        drafter=NgramDrafter(m=2, gamma=4))
    out = srv.run(prompts, n_predict=n, stop_tokens=())
    got = [r.generated for r in sorted(out.values(),
                                       key=lambda r: r.request_id)]
    assert got == want
    # untrained tiny models loop quickly: prompt-lookup drafts must land,
    # i.e. strictly fewer target forwards than tokens (tokens/cycle > 1)
    assert srv.spec_cycles > 0
    assert srv.spec_emitted > srv.spec_cycles, (
        srv.spec_emitted, srv.spec_cycles)


def test_speculative_serving_staggered(setup):
    """Slot reuse + mid-flight admission under spec steps."""
    from vsim_tpu.engine.speculative import NgramDrafter

    cfg, params = setup
    srv = ServingEngine(cfg, params, max_batch=2,
                        drafter=NgramDrafter(m=2, gamma=3))
    prompts = [[1, 2, 3], [9, 8, 7], [11, 12], [4], [6, 5, 4, 3]]
    n = 10
    want = [_reference_stream(cfg, params, p, n) for p in prompts]
    out = srv.run(prompts, n_predict=n, stop_tokens=())
    got = [r.generated for r in sorted(out.values(),
                                       key=lambda r: r.request_id)]
    assert got == want


def test_serving_unrolled_params_matches(setup):
    """Single-device TPU serving swaps in unrolled (per-layer tuple) params
    (engine/serving.py); the ragged batched step over tuple params must be
    stream-identical — exercised here on CPU by swapping params manually
    (the engine's own swap is TPU-gated)."""
    from vsim_tpu.models.init import prepare_unrolled_params

    cfg, params = setup
    prompts = [[1, 2, 3], [7, 8, 9, 10, 11], [42]]
    n = 10
    want = [_reference_stream(cfg, params, p, n) for p in prompts]

    srv = ServingEngine(cfg, params, max_batch=3)
    srv.params = prepare_unrolled_params(
        dict(params, layers=dict(params["layers"])), consume=False)
    out = srv.run(prompts, n_predict=n, stop_tokens=())
    got = [r.generated for r in sorted(out.values(),
                                       key=lambda r: r.request_id)]
    assert got == want
