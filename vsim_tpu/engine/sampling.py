"""Token sampling — reference parity math, host (numpy) and on-device (jax).

Reference: sample_top_p_top_k_repeat_penalty (utils.cpp:339-422):
  1. scale logits by 1/temp
  2. CTRL-style repeat penalty on tokens present in last_n window: negative
     scaled logits are *multiplied* by the penalty, positive ones *divided*
     (utils.cpp:358-364)
  3. top-k via partial sort (desc)
  4. softmax with max subtraction over the top-k
  5. top-p: truncate at the first index where cumsum >= top_p (inclusive),
     renormalize
  6. draw from the truncated distribution

Exact token-stream parity with the reference binary is only defined for
greedy decoding (std::discrete_distribution's consumption of mt19937 is
implementation-defined — SURVEY.md §7 hard-part 5), so the RNG here is
jax/numpy-seeded and parity tests pin greedy mode.

Seeding semantics: ``sample_np`` draws from a ``np.random.Generator`` the
caller owns; ``sample_jax`` consumes a ``jax.random`` key split per step by
the engine (engine/generate.py).  The two samplers therefore produce the
SAME distribution but DIFFERENT streams for the same integer seed — seeded
reproducibility holds within one sampler, not across them (and neither
matches the reference's mt19937 stream; greedy mode matches all three).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SamplingParams:
    """Defaults match gpt_params (utils.h:15-34)."""

    temperature: float = 0.9
    top_k: int = 40
    top_p: float = 0.9
    repeat_penalty: float = 1.3
    repeat_last_n: int = 64
    greedy: bool = False
    seed: int = -1  # -1 → time-based, like utils.cpp main seeding


def sample_np(
    logits: np.ndarray,
    last_n_tokens: Sequence[int],
    params: SamplingParams,
    rng: np.random.Generator,
) -> int:
    """Host-side sampler, a direct functional mirror of utils.cpp:339-422."""
    logits = np.asarray(logits, dtype=np.float64)
    n = logits.shape[-1]
    if params.greedy:
        return int(np.argmax(logits))

    scaled = logits / params.temperature
    if params.repeat_penalty != 1.0 and len(last_n_tokens) > 0:
        idx = np.asarray(
            [t for t in set(last_n_tokens) if 0 <= t < n], dtype=np.int64
        )
        if idx.size:
            vals = scaled[idx]
            scaled[idx] = np.where(
                logits[idx] < 0.0,
                vals * params.repeat_penalty,
                vals / params.repeat_penalty,
            )

    top_k = min(params.top_k, n) if params.top_k > 0 else n
    order = np.argsort(-scaled, kind="stable")[:top_k]
    kept = scaled[order]
    probs = np.exp(kept - kept.max())
    probs /= probs.sum()

    if params.top_p < 1.0:
        cum = np.cumsum(probs)
        cut = int(np.searchsorted(cum, params.top_p) + 1)  # first cumsum>=p kept
        probs = probs[:cut] / cum[cut - 1]
        order = order[:cut]

    choice = rng.choice(len(probs), p=probs)
    return int(order[choice])


# ---------------------------------------------------------------------------
# on-device sampler (jit-friendly; used inside the decode step so logits never
# leave the chip — replaces the reference's 50K-logit host partial_sort, the
# #4-ranked hot loop in SURVEY.md §3.4)
# ---------------------------------------------------------------------------


@partial(
    jax.jit,
    static_argnames=("top_k", "top_p", "temperature", "repeat_penalty", "greedy"),
)
def sample_jax(
    logits: jnp.ndarray,  # [B, V] f32
    last_tokens: jnp.ndarray,  # [B, W] int32, -1 padded
    key: jax.Array,
    *,
    top_k: int = 40,
    top_p: float = 0.9,
    temperature: float = 0.9,
    repeat_penalty: float = 1.3,
    greedy: bool = False,
) -> jnp.ndarray:
    """Vectorized sampler: same math as sample_np minus the host roundtrip."""
    if greedy:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    B, V = logits.shape
    scaled = logits / temperature
    # repeat penalty: build a [B, V] membership mask from the token window
    onehot = jax.nn.one_hot(
        jnp.where(last_tokens < 0, V, last_tokens), V + 1, dtype=jnp.bool_
    ).any(axis=1)[:, :V]
    penalized = jnp.where(
        logits < 0.0, scaled * repeat_penalty, scaled / repeat_penalty
    )
    scaled = jnp.where(onehot, penalized, scaled)

    k = min(top_k, V) if top_k > 0 else V
    vals, idx = jax.lax.top_k(scaled, k)  # [B, k] desc
    probs = jax.nn.softmax(vals, axis=-1)
    if top_p < 1.0:
        cum = jnp.cumsum(probs, axis=-1)
        # keep indices where the cumsum *before* this element is < top_p
        keep = (cum - probs) < top_p
        probs = jnp.where(keep, probs, 0.0)
        probs = probs / probs.sum(axis=-1, keepdims=True)
    choice = jax.random.categorical(key, jnp.log(probs + 1e-30), axis=-1)
    return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0].astype(jnp.int32)
