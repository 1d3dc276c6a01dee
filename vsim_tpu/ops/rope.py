"""Rotary position embeddings — NeoX (rotate-half) and GPT-J (interleaved).

Reference semantics (ggml_compute_forward_gptneox_rope_f32, ggml.c:6086-6153):
for position ``p`` and pair index ``i`` in the first ``n_rot`` head dims,
``theta_i = 10000^(-2 i / n_rot)``; the pair is ``(x[i], x[i + n_rot/2])`` and
rotates as ``(c*x1 - s*x2, c*x2 + s*x1)``.  Dims beyond ``n_rot`` pass through.

The GPT-J variant (upstream Cformers' GGML_OP_ROPE, mode 0) pairs *adjacent*
dims ``(x[2i], x[2i+1])`` — same angles, interleaved layout.

Unlike the reference — which re-ropes the whole K cache every step
(vsim.cpp:573-580, flagged in SURVEY.md §5 as an inefficiency not to
replicate) — callers here rope K once at insert time and cache roped keys.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions: jnp.ndarray, n_rot: int, base: float = 10000.0):
    """cos/sin tables for given positions.

    positions: int32 [...]  → returns (cos, sin) each [..., n_rot // 2] f32.
    """
    half = n_rot // 2
    # theta_i = base^(-2i/n_rot), i in [0, half)
    inv_freq = base ** (-2.0 * jnp.arange(half, dtype=jnp.float32) / n_rot)
    ang = positions.astype(jnp.float32)[..., None] * inv_freq  # [..., half]
    return jnp.cos(ang), jnp.sin(ang)


def apply_rope_neox(
    x: jnp.ndarray, positions: jnp.ndarray, n_rot: int, base: float = 10000.0
) -> jnp.ndarray:
    """Rotate-half RoPE on the first ``n_rot`` dims of the last axis.

    x: [..., T, n_head, head_dim] (or any [..., head_dim] with positions
    broadcastable to x.shape[:-2]); positions: int32 [..., T].
    """
    half = n_rot // 2
    cos, sin = rope_angles(positions, n_rot, base)  # [..., T, half]
    cos = cos[..., None, :]  # broadcast over heads
    sin = sin[..., None, :]
    x1 = x[..., :half]
    x2 = x[..., half:n_rot]
    rest = x[..., n_rot:]
    xf1 = x1.astype(jnp.float32)
    xf2 = x2.astype(jnp.float32)
    r1 = (cos * xf1 - sin * xf2).astype(x.dtype)
    r2 = (cos * xf2 + sin * xf1).astype(x.dtype)
    return jnp.concatenate([r1, r2, rest], axis=-1)


def apply_rope_gptj(
    x: jnp.ndarray, positions: jnp.ndarray, n_rot: int, base: float = 10000.0
) -> jnp.ndarray:
    """Interleaved-pair RoPE (GPT-J / CodeGen): pairs (2i, 2i+1)."""
    half = n_rot // 2
    cos, sin = rope_angles(positions, n_rot, base)
    cos = cos[..., None, :]
    sin = sin[..., None, :]
    xr = x[..., :n_rot]
    rest = x[..., n_rot:]
    lead = xr.shape[:-1]
    pairs = xr.reshape(*lead, half, 2).astype(jnp.float32)
    x1 = pairs[..., 0]
    x2 = pairs[..., 1]
    r1 = cos * x1 - sin * x2
    r2 = cos * x2 + sin * x1
    out = jnp.stack([r1, r2], axis=-1).reshape(*lead, n_rot).astype(x.dtype)
    return jnp.concatenate([out, rest], axis=-1)


def apply_rope(x, positions, n_rot, *, interleaved: bool, base: float = 10000.0):
    if n_rot <= 0:
        return x
    fn = apply_rope_gptj if interleaved else apply_rope_neox
    return fn(x, positions, n_rot, base)
