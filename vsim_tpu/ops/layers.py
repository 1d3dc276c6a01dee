"""Elementwise / normalization building blocks.

Reference counterparts: ggml_norm (LayerNorm without affine; affine applied by
explicit mul/add in the model graph, vsim.cpp:526-535), ggml_gelu (tanh-approx
via f16 lookup table, ggml.c:138-166) and exact erf GELU for HF parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def layer_norm(x, weight, bias, eps: float = 1e-5):
    """LayerNorm over the last axis, fp32 internals (ggml_norm + mul/add)."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def gelu_tanh(x):
    """tanh-approx GELU — what the reference's f16 lookup table computes
    (ggml.c:143-146: 0.5x(1+tanh(sqrt(2/pi)(x+0.044715x^3))))."""
    return jax.nn.gelu(x, approximate=True)


def gelu_exact(x):
    """erf GELU — HF transformers' default 'gelu' for NeoX/GPT-J/BLOOM."""
    return jax.nn.gelu(x, approximate=False)


ACTIVATIONS = {
    "gelu_tanh": gelu_tanh,
    "gelu_exact": gelu_exact,
    "gelu": gelu_exact,
    "gelu_new": gelu_tanh,
    "gelu_fast": gelu_tanh,
    "relu": jax.nn.relu,
    "silu": jax.nn.silu,
}


def get_activation(name: str):
    try:
        return ACTIVATIONS[name]
    except KeyError:
        raise ValueError(f"unknown activation {name!r}; known: {sorted(ACTIVATIONS)}")
