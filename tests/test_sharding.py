"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4.6: the reference has nothing distributed; these are new)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params, random_q4_params
from vsim_tpu.models.transformer import forward, init_cache
from vsim_tpu.parallel import context as pctx
from vsim_tpu.parallel.mesh import make_mesh
from vsim_tpu.parallel.sharding import param_pspecs, shard_cache, shard_params

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = ModelConfig(
    arch="gptneox", n_vocab=256, n_ctx=32, n_embd=128, n_head=8,
    n_layer=2, n_ff=256, n_rot=8,
)


def test_tp_matches_single_device():
    """Sharded forward must be numerically identical to unsharded."""
    params = init_params(CFG, seed=0, quantize=True, scale_dtype=np.float32)
    ids = jnp.arange(1, 9, dtype=jnp.int32)[None, :]
    cache = init_cache(CFG, batch=1)
    ref_logits, _ = forward(CFG, params, ids, cache, 0)

    mesh = make_mesh((1, 8))
    sharded = shard_params(params, mesh)
    scache = shard_cache(init_cache(CFG, batch=1), mesh)
    with pctx.use_mesh(mesh):
        fn = jax.jit(lambda p, t, c: forward(CFG, p, t, c, 0))
        got_logits, _ = fn(sharded, ids, scache)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-4, atol=1e-4
    )


def test_param_specs_cover_tree():
    params = random_q4_params(CFG, seed=0)
    mesh = make_mesh((2, 4))
    specs = param_pspecs(params, mesh)
    n_leaves = len(jax.tree.leaves(params))
    n_specs = len(
        jax.tree.leaves(
            specs, is_leaf=lambda x: isinstance(x, jax.sharding.PartitionSpec)
        )
    )
    assert n_leaves == n_specs
    # q/k/v weights must be model-sharded on the O axis (K-major: last dim)
    wq_spec = specs["layers"]["wq"]
    assert wq_spec.packed[-1] == "model"
    # wo sharded on K (sublane) axis
    assert specs["layers"]["wo"].packed[-2] == "model"


def test_dp_tp_decode_step():
    """(2 data, 4 model) mesh: prefill + decode one step each."""
    params = random_q4_params(CFG, seed=0)
    mesh = make_mesh((2, 4))
    sharded = shard_params(params, mesh)
    cache = shard_cache(init_cache(CFG, batch=2), mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    ids = jax.device_put(
        jnp.ones((2, 8), jnp.int32), NamedSharding(mesh, P("data", None))
    )
    with pctx.use_mesh(mesh):
        fn = jax.jit(lambda p, t, c, n: forward(CFG, p, t, c, n))
        logits, cache = fn(sharded, ids, cache, jnp.int32(0))
        logits2, cache = fn(sharded, ids[:, :1], cache, jnp.int32(8))
    assert logits.shape == (2, 8, 256)
    assert logits2.shape == (2, 1, 256)
    assert np.all(np.isfinite(np.asarray(logits2)))


def test_graft_dryrun_multichip():
    import sys, os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_sequence_parallel_matches_single_device():
    """Megatron-SP (token axis sharded over model through LN/residual
    segments) must be numerically identical to the unsharded forward."""
    params = init_params(CFG, seed=2, quantize=True, scale_dtype=np.float32)
    ids = jnp.arange(1, 9, dtype=jnp.int32)[None, :].repeat(2, axis=0)
    ref = forward(CFG, params, ids, None, 0)[0]

    mesh = make_mesh((1, 8))
    sharded = shard_params(params, mesh)
    with pctx.use_mesh(mesh, rules={"seq": "model"}):
        got = jax.jit(lambda p, t: forward(CFG, p, t, None, 0)[0])(sharded, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
