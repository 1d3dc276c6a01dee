"""Quantized matmul — TPU-native replacement for the reference's hot path.

The reference routes every Q4_0 matmul through
``ggml_compute_forward_mul_mat_q4_0_f32`` (ggml.c:4891-5165), which either
runs a per-row scalar/CGRA dot (imax.c:1133-2292) or a dequantize-to-f32 +
BLAS GEMM fast path for batched prefill (ggml.c:4957-5022).

Here the same split becomes:
  * ``impl='xla'``    — dequantize + jnp.einsum; XLA tiles it onto the MXU.
    This is the correctness oracle (the reference's "scalar fallback" role)
    and the prefill path (compute-bound, dequant amortized over the batch).
  * ``impl='pallas'`` — fused dequant+matmul Pallas kernel; weights stay Q4
    in HBM and are dequantized in VMEM.  The decode (GEMV) path, where HBM
    bandwidth on the weight bytes is the wall.  See vsim_tpu/ops/pallas_q4.py.

``q4_matmul(x, w)`` computes ``x @ dequant(w).T`` for ``w`` logical [O, K],
``x`` [..., K] → [..., O], i.e. the reference's ``ggml_mul_mat(w, x)``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Union

import jax
import jax.numpy as jnp

from vsim_tpu.quant.q4 import Q4Tensor, dequantize_km, fake_quantize


@dataclasses.dataclass
class Q4Layer:
    """One layer of a stacked Q4 weight, addressed by a traced index.

    Built inside the model's layer scan so the matmul can select the layer
    *inside the Pallas kernel* (scalar prefetch) instead of having the scan
    materialize a per-step dynamic-slice copy of the weight in HBM."""

    stacked: Q4Tensor  # packed [L, K/2, O]
    il: jnp.ndarray  # int32 scalar

    @property
    def shape(self):
        return self.stacked.shape[1:]


Weight = Union[Q4Tensor, "Q4Layer", jnp.ndarray]

# Toggled by vsim_tpu.config; 'auto' picks pallas for decode-shaped GEMVs on TPU.
_DEFAULT_IMPL = "auto"


def set_default_impl(impl: str) -> None:
    global _DEFAULT_IMPL
    assert impl in ("auto", "xla", "pallas")
    _DEFAULT_IMPL = impl


def get_default_impl() -> str:
    return _DEFAULT_IMPL


def _xla_q4_matmul(x: jnp.ndarray, w: Q4Tensor, compute_dtype) -> jnp.ndarray:
    wd = dequantize_km(w, dtype=compute_dtype)  # [K, O], no transpose needed
    return jnp.einsum(
        "...k,ko->...o",
        x.astype(compute_dtype),
        wd,
        preferred_element_type=jnp.float32,
    )


def _use_pallas(x: jnp.ndarray, w: Q4Tensor) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if w.scales.dtype == jnp.float16:
        return False  # f16 is not representable in Mosaic; XLA path serves it
    O, K = w.shape
    # MXU/VPU-aligned shapes only; fall back to XLA otherwise.
    if K % 256 != 0 or O % 256 != 0:
        return False
    rows = 1
    for d in x.shape[:-1]:
        rows *= d
    return rows <= 128


def q4_matmul(
    x: jnp.ndarray,
    w: Weight,
    *,
    bias: Optional[jnp.ndarray] = None,
    impl: Optional[str] = None,
    compute_dtype=jnp.float32,
) -> jnp.ndarray:
    """``x [..., K] @ w.T (+ bias)`` with ``w`` a Q4Tensor [O, K], a Q4Layer
    (one layer of a stacked Q4 weight), or dense [O, K].

    Dense weights take the plain XLA GEMM (used by the fp16/bf16 model variant
    and by training); quantized weights dispatch per ``impl``.  ``bias`` is
    folded into the plane-split Pallas kernel's output init (one less XLA op
    on the decode path) and added as a plain op on every other path.
    """
    def _with_bias(y):
        if bias is None:
            return y
        b = bias
        if b.shape[-1] != y.shape[-1]:  # kernel-padded lm_head
            b = jnp.pad(b, (0, y.shape[-1] - b.shape[-1]))
        return y + b.astype(y.dtype)

    if isinstance(w, Q4Layer):
        one = Q4Tensor(packed=w.stacked.packed[0], scales=w.stacked.scales[0])
        impl_r = impl or _DEFAULT_IMPL
        if impl_r in ("auto", "pallas") and _use_pallas(x, one):
            from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul_stacked

            return _with_bias(pallas_q4_matmul_stacked(x, w.stacked, w.il))
        # fallback: slice the layer out (CPU tests / misaligned shapes)
        sliced = Q4Tensor(
            packed=jax.lax.dynamic_index_in_dim(
                w.stacked.packed, w.il, 0, keepdims=False),
            scales=jax.lax.dynamic_index_in_dim(
                w.stacked.scales, w.il, 0, keepdims=False),
        )
        return q4_matmul(x, sliced, bias=bias, impl="xla",
                         compute_dtype=compute_dtype)
    if not isinstance(w, Q4Tensor):
        return _with_bias(jnp.einsum(
            "...k,ok->...o",
            x.astype(compute_dtype),
            w.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        ))

    impl = impl or _DEFAULT_IMPL
    if impl == "auto":
        impl = "pallas" if _use_pallas(x, w) else "xla"
    if impl == "pallas":
        if w.layout == "ps":  # glue-free decode path (plane-split layout)
            from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul_ps

            return pallas_q4_matmul_ps(x, w, bias=bias)
        from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul

        return _with_bias(pallas_q4_matmul(x, w))
    return _with_bias(_xla_q4_matmul(x, w, compute_dtype))


def q4_matmul_act_quant(
    x: jnp.ndarray, w: Weight, *, compute_dtype=jnp.float32
) -> jnp.ndarray:
    """Reference-parity mode: also quantize the activations to Q4_0 before the
    dot, as the reference does in the matmul INIT phase (ggml.c:5030-5038) —
    both operands are then dequantized inside ggml_vec_dot_q4_0
    (ggml.c:472-511).  Used for perplexity/logits parity at matched bit-width.
    """
    lead = x.shape[:-1]
    K = x.shape[-1]
    xq = fake_quantize(x.reshape(-1, K)).reshape(*lead, K)
    return q4_matmul(xq, w, impl="xla", compute_dtype=compute_dtype)
