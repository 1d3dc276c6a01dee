"""Perplexity / logit-quality evaluation.

BASELINE.md's quality north star is "ppl Δ vs fp16 within the reference INT4
delta".  The reference itself has no ppl harness (its quality check is the
`--return_logits` HF-parity protocol, vsim.cpp:827-873); this module supplies
both:

  * ``perplexity(cfg, params, tokens)`` — teacher-forced NLL over a token
    stream, chunked to n_ctx windows, cache-free forward.
  * ``logit_delta(...)`` — max/mean abs logit difference between two
    parameterizations of the same model (e.g. Q4 vs dense fp32), the
    quantization-noise measurement.

Activation-quantization parity: the reference also quantizes activations to
Q4_0 inside the matmul INIT phase (ggml.c:5030-5038); use the model's
``q4_matmul_act_quant`` path to measure ppl at matched bit-width.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.transformer import forward_nocache


def perplexity(
    cfg: ModelConfig,
    params,
    tokens: Sequence[int],
    *,
    window: int = 0,
) -> Dict[str, float]:
    """Teacher-forced perplexity of a token stream.

    Non-overlapping windows of ``window`` (default n_ctx) tokens; the first
    token of each window is context-free (standard strided ppl protocol).
    The last ragged window is padded and its pad positions masked out of the
    NLL, so every window runs the same compiled program.
    """
    W = window or cfg.n_ctx

    @jax.jit
    def chunk_nll(params, ids, valid):
        # ids [1, W]; valid [1, W-1] marks real (non-pad) targets
        logits = forward_nocache(cfg, params, ids)
        logp = jax.nn.log_softmax(logits[:, :-1, :].astype(jnp.float32), -1)
        tgt = ids[:, 1:]
        nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        return (nll * valid).sum(), valid.sum()

    toks = np.asarray(list(tokens), np.int32)
    assert toks.size >= 2, "need at least 2 tokens"
    total_nll = total_cnt = 0.0
    for s in range(0, toks.size - 1, W - 1):
        chunk = toks[s : s + W]
        if chunk.size < 2:
            break
        pad = W - chunk.size
        ids = np.pad(chunk, (0, pad))[None, :]
        valid = np.zeros((1, W - 1), np.float32)
        valid[0, : chunk.size - 1] = 1.0
        nll, cnt = chunk_nll(params, jnp.asarray(ids), jnp.asarray(valid))
        total_nll += float(nll)
        total_cnt += float(cnt)
    ppl = float(np.exp(total_nll / max(total_cnt, 1.0)))
    return {"nll": total_nll, "tokens": int(total_cnt), "ppl": ppl}


def logit_delta(
    cfg_a: ModelConfig,
    params_a,
    cfg_b: ModelConfig,
    params_b,
    tokens: Sequence[int],
) -> Dict[str, float]:
    """Max/mean abs logit difference between two parameterizations on the
    same prompt — the reference's --return_logits comparison as a metric."""
    ids = jnp.asarray(np.asarray(list(tokens), np.int32)[None, :])
    la = np.asarray(
        jax.jit(lambda p, i: forward_nocache(cfg_a, p, i))(params_a, ids),
        np.float32)
    lb = np.asarray(
        jax.jit(lambda p, i: forward_nocache(cfg_b, p, i))(params_b, ids),
        np.float32)
    d = np.abs(la - lb)
    return {
        "max_abs": float(d.max()),
        "mean_abs": float(d.mean()),
        "argmax_match": float((la.argmax(-1) == lb.argmax(-1)).mean()),
    }
