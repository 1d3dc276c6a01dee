"""Training/finetuning step over the dense-weight model variant.

The reference is inference-only, but the rebuilt framework ships a jit/pjit
training step for (a) the driver's multi-chip dry-run, (b) quantization-aware
calibration experiments, and (c) perplexity baselining at fp precision.
Quantized (Q4Tensor) leaves are frozen; only dense float leaves receive
gradients.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import optax

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.transformer import forward


def cross_entropy_loss(cfg: ModelConfig, params, token_ids: jnp.ndarray):
    """Next-token cross entropy over a [B, T] batch (cache-free forward)."""
    logits, _ = forward(cfg, params, token_ids[:, :-1], None, 0)
    targets = token_ids[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()


def make_train_step(cfg: ModelConfig, optimizer=None):
    """Returns (init_fn, step_fn); step_fn is jit-ready (donate params/opt)."""
    optimizer = optimizer or optax.adamw(1e-4)

    def init_fn(params):
        return optimizer.init(params)

    @partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, token_ids) -> Tuple[Any, Any, jnp.ndarray]:
        loss, grads = jax.value_and_grad(
            lambda p: cross_entropy_loss(cfg, p, token_ids)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_fn, step_fn


def perplexity(cfg: ModelConfig, params, token_ids: jnp.ndarray) -> float:
    """Whole-sequence perplexity (the ppl-Δ-vs-fp16 metric in BASELINE.md)."""
    loss = cross_entropy_loss(cfg, params, token_ids)
    return float(jnp.exp(loss))
