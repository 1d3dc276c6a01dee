"""Pipeline parallelism: staged GPipe forward must match the plain forward
bit-for-bit (same math, just scheduled across the pipe axis)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params
from vsim_tpu.models.transformer import forward_nocache
from vsim_tpu.parallel.pipeline import (
    AXIS_PIPE,
    pipeline_forward_nocache,
    stage_params,
)


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        arch="gptneox", n_vocab=128, n_ctx=32, n_embd=64, n_head=4,
        n_layer=4, n_ff=128, n_rot=8, compute_dtype="float32",
    )
    params = init_params(cfg, seed=11, quantize=True)
    return cfg, params


@pytest.mark.parametrize("n_stages,n_micro", [(2, 2), (4, 3)])
def test_pipeline_matches_plain(setup, n_stages, n_micro):
    cfg, params = setup
    devs = jax.devices()[:n_stages]
    mesh = Mesh(np.asarray(devs), (AXIS_PIPE,))

    rng = np.random.default_rng(0)
    mB, T = 2, 8
    ids = jnp.asarray(
        rng.integers(0, cfg.n_vocab, size=(n_micro, mB, T)), jnp.int32)

    staged = stage_params(params, n_stages, mesh)
    got = pipeline_forward_nocache(cfg, staged, ids, mesh)
    assert got.shape == (n_micro, mB, T, cfg.n_vocab)

    want = jax.vmap(lambda i: forward_nocache(cfg, params, i))(ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_stage_params_shapes(setup):
    cfg, params = setup
    mesh = Mesh(np.asarray(jax.devices()[:2]), (AXIS_PIPE,))
    staged = stage_params(params, 2, mesh)
    assert staged["layers"]["ln1_w"].shape == (2, 2, cfg.n_embd)
    assert staged["layers"]["wq"].packed.shape[:2] == (2, 2)
