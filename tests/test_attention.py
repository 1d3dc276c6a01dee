"""Flash attention kernel vs the materialized-scores XLA oracle.

The oracle replicates the reference attention chain KQ→scale→diag_mask_inf→
soft_max→KQV (vsim.cpp:583-615); the kernel must match it on every masking
configuration the model forward uses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsim_tpu.models.transformer import alibi_slopes
from vsim_tpu.ops.attention import attention_reference, flash_attention

INTERPRET = jax.default_backend() != "tpu"


def _qkv(B, T, S, H, D, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, T, H, D)) * 0.5, dtype)
    k = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.5, dtype)
    v = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.5, dtype)
    return q, k, v


@pytest.mark.parametrize(
    "B,T,S,H,D,n_past,bq,bs",
    [
        (1, 256, 256, 2, 64, 0, 128, 128),  # square causal prefill
        (2, 128, 384, 2, 64, 256, 128, 128),  # decode chunk against a cache
        (1, 128, 512, 1, 128, 37, 128, 128),  # ragged offset, D=128
        (1, 130, 260, 1, 64, 0, 64, 128),  # non-multiple T/S (padded tiles)
    ],
)
def test_flash_matches_oracle(B, T, S, H, D, n_past, bq, bs):
    q, k, v = _qkv(B, T, S, H, D, seed=T + S)
    # zero cache slots beyond n_past+T mirror real prefill state
    ref = attention_reference(q, k, v, n_past=n_past)
    got = flash_attention(q, k, v, n_past=n_past, block_q=bq, block_s=bs,
                          interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_alibi_matches_oracle():
    B, T, S, H, D = 1, 128, 128, 4, 64
    q, k, v = _qkv(B, T, S, H, D, seed=3)
    slopes = alibi_slopes(H)
    ref = attention_reference(q, k, v, n_past=0, slopes=slopes)
    got = flash_attention(q, k, v, n_past=0, slopes=slopes,
                          block_q=64, block_s=64, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_noncausal():
    B, T, S, H, D = 1, 128, 256, 2, 64
    q, k, v = _qkv(B, T, S, H, D, seed=5)
    ref = attention_reference(q, k, v, causal=False)
    got = flash_attention(q, k, v, causal=False, block_q=64, block_s=128,
                          interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_flash_bf16_inputs():
    B, T, S, H, D = 1, 128, 128, 2, 64
    q, k, v = _qkv(B, T, S, H, D, seed=7, dtype=jnp.bfloat16)
    ref = attention_reference(q, k, v, n_past=0)
    got = flash_attention(q, k, v, n_past=0, block_q=64, block_s=64,
                          interpret=INTERPRET)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=2e-2, atol=2e-2)


def test_flash_in_model_prefill():
    """Model forward with flash attention enabled must match the einsum path."""
    from vsim_tpu.models.config import PRESETS
    from vsim_tpu.models.init import random_q4_params
    from vsim_tpu.models.transformer import forward, init_cache

    cfg = PRESETS["pythia-70m"].replace(n_ctx=256)
    params = random_q4_params(cfg, seed=0)
    ids = jnp.asarray(np.arange(128)[None, :] % 50, jnp.int32)

    ref, _ = forward(cfg, params, ids, init_cache(cfg, 1), 0, kv_len=128)
    got, _ = forward(cfg.replace(use_flash=True), params, ids,
                     init_cache(cfg, 1), 0, kv_len=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_flash_vjp_matches_oracle_grads():
    """Flash backward (custom VJP) vs autodiff through the einsum oracle."""
    B, T, S, H, D = 1, 128, 128, 2, 64
    q, k, v = _qkv(B, T, S, H, D, seed=11)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, n_past=0, block_q=64, block_s=64,
                            interpret=INTERPRET)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, n_past=0)
        return jnp.sum(o * o)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, exp in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=2e-4, atol=2e-4)


def test_flash_vjp_alibi_noncausal_grads():
    B, T, S, H, D = 1, 64, 128, 4, 64
    q, k, v = _qkv(B, T, S, H, D, seed=13)
    slopes = alibi_slopes(H)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, causal=False, slopes=slopes,
                            block_q=64, block_s=64, interpret=INTERPRET)
        return jnp.sum(jnp.sin(o))

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, causal=False, slopes=slopes)
        return jnp.sum(jnp.sin(o))

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, exp in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=2e-4, atol=2e-4)


def test_flash_vjp_offset_grads():
    """n_past offset (decode-against-cache shape) backward parity."""
    B, T, S, H, D = 2, 64, 192, 2, 64
    q, k, v = _qkv(B, T, S, H, D, seed=17)

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, n_past=128, block_q=64, block_s=64,
                            interpret=INTERPRET)
        return jnp.sum(o)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, n_past=128)
        return jnp.sum(o)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for got, exp in zip(g_flash, g_ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=2e-4, atol=2e-4)
