"""Q4_0 block quantization — the TPU-native rebirth of the reference's quant core.

Reference semantics (ggml.c:204-251 in /root/reference):
  * blocks of QK=32 values along the contraction (K) axis
  * per-block fp32 scale ``d = absmax / 7``
  * values stored as unsigned 4-bit with a fixed zero offset of 8:
      ``q = int8(round(v / d)) + 8``  (C ``round`` = half-away-from-zero)
  * two values per byte: element ``2c`` in the low nibble, ``2c+1`` in the high
    nibble (ggml.c:234-244 packs adjacent pairs)

TPU-native layout divergence (deliberate, see SURVEY.md §7 "hard parts"):
the reference interleaves a 4-byte scale with 16 nibble-bytes per 20-byte
block (ggml.c:213).  Interleaved scalars defeat vectorized loads, so packed
nibbles and scales live in two *separate* dense arrays — and both are stored
**K-major** (contraction dim on TPU sublanes, outputs on lanes):

  ``packed``  uint8   [K//2,  O]   byte (c, o) holds elements k=2c (low
                                   nibble) and k=2c+1 (high nibble) of
                                   logical weight row o
  ``scales``  f16/f32 [K//32, O]   per-block scale

K-major means a fused dequant+matmul kernel feeds the MXU with zero
transposes: ``y = dot(x_even, lo) + dot(x_odd, hi)`` where lo/hi are the
nibble planes (even/odd K) and the per-block scales expand along sublanes
with a broadcast-reshape (no lane shuffles anywhere).

The numpy functions at the bottom keep the reference's row-major [O, K] view
for ggml wire-format parity; ``Q4Tensor.from_dense_np`` bridges the two.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import ml_dtypes
import numpy as np

QK = 32  # block size along K, matches reference (ggml.c:204 `#define QK 32`)
GGML_BLOCK_BYTES = 4 + QK // 2  # reference stream layout: f32 scale + 16 nibble bytes

# Default runtime scale dtype.  bfloat16: Mosaic/TPU-native 16-bit (f16 is not
# representable in the Mosaic dialect); the ≤0.4% scale rounding is far below
# the Q4 quantization noise (d/2 ≈ 7% of amax).  fp32 mode is kept for
# bit-parity with the reference's f32 block scales; fp16 for ggml interop
# (auto-served by the XLA path instead of the Pallas kernel).
DEFAULT_SCALE_DTYPE = np.dtype(ml_dtypes.bfloat16)


def _round_half_away_np(v: np.ndarray) -> np.ndarray:
    """C round(): round half away from zero (numpy rounds half to even)."""
    return np.floor(np.abs(v) + 0.5) * np.sign(v)


def _round_half_away_jnp(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.floor(jnp.abs(v) + 0.5) * jnp.sign(v)


# ---------------------------------------------------------------------------
# Q4Tensor — the quantized-weight pytree leaf container (K-major storage)
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class Q4Tensor:
    """A 2-D weight matrix stored Q4_0-quantized, K-major.

    Logical shape is ``(out_features, in_features)`` = ``(O, K)``; the matmul
    contracts over K exactly like the reference's ``ggml_mul_mat(w, x)``.
    Leading axes (e.g. a stacked layer dim for lax.scan) pass through.
    """

    packed: jnp.ndarray  # uint8 [..., K//2, O]
    scales: jnp.ndarray  # float16/float32 [..., K//QK, O]
    # nibble layout of a packed byte c:
    #   "i"  (interleaved, the ggml-native order): elements 2c | 2c+1
    #   "ps" (plane-split, decode fast path): elements c | c + K/2 — the two
    #        activation planes become CONTIGUOUS halves of x, so the Pallas
    #        kernel takes raw [N, K] x with no host-side deinterleave/pad
    #        glue (to_plane_split; ops/pallas_q4.py _kernel_ps)
    layout: str = "i"

    def tree_flatten(self):
        return (self.packed, self.scales), self.layout

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, layout=aux or "i")

    @property
    def shape(self) -> Tuple[int, ...]:
        return (*self.packed.shape[:-2], self.packed.shape[-1],
                self.packed.shape[-2] * 2)

    @property
    def out_features(self) -> int:
        return self.packed.shape[-1]

    @property
    def in_features(self) -> int:
        return self.packed.shape[-2] * 2

    @property
    def dtype(self):
        # the dtype a dequantized matmul produces
        return jnp.float32

    @property
    def nbytes(self) -> int:
        return self.packed.size + self.scales.size * self.scales.dtype.itemsize

    # -- constructors ------------------------------------------------------

    @classmethod
    def from_dense_np(cls, w: np.ndarray, scale_dtype=DEFAULT_SCALE_DTYPE) -> "Q4Tensor":
        """Quantize a dense [..., O, K] numpy weight (row-major logical view).

        Uses the multithreaded native quantizer (vsim_tpu/native) when built;
        numerics are bit-identical to quantize_q4_0_np either way.
        """
        from vsim_tpu import native

        lead = w.shape[:-2]
        O, K = w.shape[-2:]
        w2 = np.ascontiguousarray(w, np.float32).reshape(-1, K)
        if native.available():
            packed, scales_f32 = native.q4_quantize(w2)
            scales = scales_f32.astype(scale_dtype)
        else:
            packed, scales = quantize_q4_0_np(w2, scale_dtype=scale_dtype)
        packed = packed.reshape(*lead, O, K // 2)
        scales = scales.reshape(*lead, O, K // QK)
        # transpose the two minor dims → K-major storage
        return cls(
            packed=jnp.asarray(np.swapaxes(packed, -1, -2).copy()),
            scales=jnp.asarray(np.swapaxes(scales, -1, -2).copy()),
        )

    def pad_out(self, multiple: int = 256) -> "Q4Tensor":
        """Zero-pad the output dim (lanes) to a multiple — lets misaligned
        vocab sizes (e.g. 50400) ride the Pallas kernel.  Padded rows carry
        scale 0 so they dequantize to exactly 0."""
        O = self.out_features
        pad = (-O) % multiple
        if pad == 0:
            return self
        widths = [(0, 0)] * (self.packed.ndim - 1) + [(0, pad)]
        return Q4Tensor(
            packed=jnp.pad(self.packed, widths),
            scales=jnp.pad(self.scales, widths),
            layout=self.layout,
        )

    @classmethod
    def from_row_major(cls, packed_ok: np.ndarray, scales_ok: np.ndarray):
        """Wrap reference-layout arrays (packed [..., O, K//2])."""
        return cls(
            packed=jnp.asarray(np.swapaxes(np.asarray(packed_ok), -1, -2).copy()),
            scales=jnp.asarray(np.swapaxes(np.asarray(scales_ok), -1, -2).copy()),
        )


# ---------------------------------------------------------------------------
# NumPy packers — reference row-major [O, K] view, bit-exact vs ggml formula
# ---------------------------------------------------------------------------


def quantize_q4_0_np(
    w: np.ndarray, scale_dtype=DEFAULT_SCALE_DTYPE
) -> Tuple[np.ndarray, np.ndarray]:
    """Quantize fp weights [O, K] to (packed uint8 [O, K//2], scales [O, K//QK]).

    Matches ggml.c:209-250 exactly when ``scale_dtype=np.float32``:
    d = amax/7 (f32), id = 1/d or 0, q = int8(round(v*id)) + 8.
    """
    if w.ndim != 2:
        raise ValueError(f"Q4_0 quantization needs a 2-D matrix, got {w.shape}")
    O, K = w.shape
    if K % QK != 0:
        raise ValueError(f"K={K} not a multiple of QK={QK}")
    nb = K // QK
    blocks = np.ascontiguousarray(w, dtype=np.float32).reshape(O, nb, QK)
    amax = np.max(np.abs(blocks), axis=-1)  # [O, nb]
    d = (amax / 7.0).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(
            np.float32
        )
    v = blocks * inv[..., None]
    q = _round_half_away_np(v)
    q = np.clip(q, -8, 7).astype(np.int8) + np.int8(8)  # [0,15]; d==0 -> 8
    q = q.astype(np.uint8).reshape(O, K // 2, 2)
    packed = (q[..., 0] | (q[..., 1] << 4)).astype(np.uint8)
    return packed, d.astype(scale_dtype)


def dequantize_q4_0_np(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Inverse of quantize_q4_0_np → fp32 [O, K] (ggml.c:301-334 semantics)."""
    O, half_k = packed.shape
    lo = (packed & 0x0F).astype(np.int8) - 8
    hi = (packed >> 4).astype(np.int8) - 8
    q = np.stack([lo, hi], axis=-1).reshape(O, half_k * 2).astype(np.float32)
    s = np.repeat(scales.astype(np.float32), QK, axis=-1)
    return q * s


def quantize_q4_0_with_hist_np(w: np.ndarray, scale_dtype=DEFAULT_SCALE_DTYPE):
    """Like quantize_q4_0_np but also returns the 16-bin nibble histogram that
    the reference quantizer CLIs report (utils.cpp:425-482)."""
    packed, scales = quantize_q4_0_np(w, scale_dtype)
    lo = packed & 0x0F
    hi = packed >> 4
    hist = np.bincount(np.concatenate([lo.ravel(), hi.ravel()]), minlength=16)
    return packed, scales, hist.astype(np.int64)


# ---------------------------------------------------------------------------
# JAX packers (on-device; activation quantization / runtime repack)
# ---------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("scale_dtype",))
def quantize_q4_0(w: jnp.ndarray, scale_dtype=DEFAULT_SCALE_DTYPE) -> Q4Tensor:
    """On-device Q4_0 quantization of an [O, K] matrix → K-major Q4Tensor."""
    O, K = w.shape
    nb = K // QK
    blocks = w.astype(jnp.float32).reshape(O, nb, QK)
    amax = jnp.max(jnp.abs(blocks), axis=-1)
    d = amax / 7.0
    inv = jnp.where(d != 0.0, 1.0 / d, 0.0)
    q = _round_half_away_jnp(blocks * inv[..., None])
    q = jnp.clip(q, -8, 7).astype(jnp.int8) + 8
    q = q.astype(jnp.uint8).reshape(O, K // 2, 2)
    packed = q[..., 0] | (q[..., 1] << 4)
    return Q4Tensor(packed=packed.T, scales=d.astype(scale_dtype).T)


def to_plane_split(w: Q4Tensor) -> Q4Tensor:
    """Repack an interleaved Q4Tensor to the plane-split layout (device-side
    bit ops; scales unchanged — the block of plane-split row c is c//32 for
    the lo nibble and K/64 + c//32 for the hi nibble)."""
    if w.layout == "ps":
        return w
    packed = w.packed
    lead = packed.shape[:-2]
    half_k, O = packed.shape[-2:]
    lo = packed & 0x0F
    hi = packed >> 4
    el = jnp.stack([lo, hi], axis=-2).reshape(*lead, 2 * half_k, O)
    new = el[..., :half_k, :] | (el[..., half_k:, :] << 4)
    return Q4Tensor(packed=new, scales=w.scales, layout="ps")


def dequantize_km(w: Q4Tensor, dtype=jnp.float32) -> jnp.ndarray:
    """XLA dequantize, K-major result: [..., K, O] (matmul-ready)."""
    packed, scales = w.packed, w.scales
    lead = packed.shape[:-2]
    half_k, O = packed.shape[-2:]
    lo = (packed & 0x0F).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    if w.layout == "ps":  # byte c = elements c | c + K/2
        q = jnp.concatenate([lo, hi], axis=-2)
    else:  # byte c = elements 2c | 2c+1
        q = jnp.stack([lo, hi], axis=-2).reshape(*lead, half_k * 2, O)
    s = jnp.repeat(scales.astype(dtype), QK, axis=-2)
    return q.astype(dtype) * s


def dequantize_q4_0(w: Q4Tensor, dtype=jnp.float32) -> jnp.ndarray:
    """XLA dequantize to the logical row-major [..., O, K] view."""
    return jnp.swapaxes(dequantize_km(w, dtype), -1, -2)


def fake_quantize(w: jnp.ndarray, scale_dtype=jnp.float32) -> jnp.ndarray:
    """Quantize-dequantize roundtrip (the reference's effective activation
    treatment: activations are quantized to Q4_0 on the fly in the matmul INIT
    phase, ggml.c:5030-5038, then dequantized inside the dot kernel)."""
    O, K = w.shape
    nb = K // QK
    blocks = w.astype(jnp.float32).reshape(O, nb, QK)
    amax = jnp.max(jnp.abs(blocks), axis=-1)
    d = amax / 7.0
    inv = jnp.where(d != 0.0, 1.0 / d, 0.0)
    q = jnp.clip(_round_half_away_jnp(blocks * inv[..., None]), -8, 7)
    deq = q * d.astype(scale_dtype).astype(jnp.float32)[..., None]
    return deq.reshape(O, K)


# ---------------------------------------------------------------------------
# Q4_1 (min + delta) — reference ggml.c:252-299, 336-367; serialized per-row
# planar by ggml_quantize_q4_1 (utils.cpp:484-536):
#   row = [nb × f32 min][nb × f32 delta][nb × QK/2 nibble bytes]
# value = nibble * delta + min, nibble unsigned 0..15 (no fixed zero offset).
# The reference quantizer CLIs accept ftype 3 (quantize_gptneox.cpp:34-38), so
# artifacts from the wild may carry it; we read (and write) the format but run
# it dense — Q4_0 remains the runtime kernel format.
# ---------------------------------------------------------------------------


def quantize_q4_1_np(w: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Quantize fp weights [O, K] → (packed uint8 [O, K//2], deltas f32
    [O, K//QK], mins f32 [O, K//QK]) with reference Q4_1 math."""
    if w.ndim != 2:
        raise ValueError(f"Q4_1 quantization needs a 2-D matrix, got {w.shape}")
    O, K = w.shape
    if K % QK != 0:
        raise ValueError(f"K={K} not a multiple of QK={QK}")
    nb = K // QK
    blocks = np.ascontiguousarray(w, np.float32).reshape(O, nb, QK)
    mn = blocks.min(axis=-1)
    mx = blocks.max(axis=-1)
    d = ((mx - mn) / 15.0).astype(np.float32)
    with np.errstate(divide="ignore"):
        inv = np.where(d != 0.0, np.float32(1.0) / d, np.float32(0.0)).astype(
            np.float32)
    v = (blocks - mn[..., None]) * inv[..., None]
    q = np.clip(_round_half_away_np(v), 0, 15).astype(np.uint8)
    q = q.reshape(O, K // 2, 2)
    packed = (q[..., 0] | (q[..., 1] << 4)).astype(np.uint8)
    return packed, d, mn.astype(np.float32)


def dequantize_q4_1_np(packed: np.ndarray, deltas: np.ndarray,
                       mins: np.ndarray) -> np.ndarray:
    """Inverse of quantize_q4_1_np → f32 [O, K] (ggml.c:336-367 semantics)."""
    O, half_k = packed.shape
    lo = (packed & 0x0F).astype(np.float32)
    hi = (packed >> 4).astype(np.float32)
    q = np.stack([lo, hi], axis=-1).reshape(O, half_k * 2)
    d = np.repeat(deltas.astype(np.float32), QK, axis=-1)
    m = np.repeat(mins.astype(np.float32), QK, axis=-1)
    return q * d + m


def from_ggml_q4_1_bytes(raw: np.ndarray, O: int, K: int):
    """Reference per-row planar Q4_1 stream → (packed, deltas, mins)."""
    nb = K // QK
    row_bytes = nb * (8 + QK // 2)
    rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    rec = rec.reshape(O, row_bytes)
    mins = rec[:, : 4 * nb].copy().view(np.float32).reshape(O, nb)
    deltas = rec[:, 4 * nb: 8 * nb].copy().view(np.float32).reshape(O, nb)
    packed = rec[:, 8 * nb:].reshape(O, K // 2).copy()
    return packed, deltas, mins


def to_ggml_q4_1_bytes(packed: np.ndarray, deltas: np.ndarray,
                       mins: np.ndarray) -> np.ndarray:
    """Inverse of from_ggml_q4_1_bytes → reference byte stream."""
    O, half_k = packed.shape
    nb = half_k // (QK // 2)
    row_bytes = nb * (8 + QK // 2)
    rec = np.empty((O, row_bytes), dtype=np.uint8)
    rec[:, : 4 * nb] = (np.ascontiguousarray(mins.astype(np.float32))
                        .view(np.uint8).reshape(O, 4 * nb))
    rec[:, 4 * nb: 8 * nb] = (np.ascontiguousarray(deltas.astype(np.float32))
                              .view(np.uint8).reshape(O, 4 * nb))
    rec[:, 8 * nb:] = packed
    return rec.reshape(-1)


# ---------------------------------------------------------------------------
# Row gather (embedding lookup on a quantized table, ggml GET_ROWS analogue)
# ---------------------------------------------------------------------------


def q4_take_rows(w: Q4Tensor, ids: jnp.ndarray, dtype=jnp.float32) -> jnp.ndarray:
    """Gather + dequantize logical rows (axis O) of a Q4 matrix → [..., K]
    (reference: ggml_get_rows on a quantized wte, vsim.cpp:518)."""
    assert w.layout == "i", (
        "q4_take_rows assumes the interleaved layout; embeddings are never "
        "plane-split (engine transforms only matmul weights)")
    packed = jnp.take(w.packed, ids, axis=-1)  # [K//2, *ids.shape]
    scales = jnp.take(w.scales, ids, axis=-1)  # [K//QK, *ids.shape]
    half_k = packed.shape[0]
    lo = (packed & 0x0F).astype(jnp.int8) - 8
    hi = (packed >> 4).astype(jnp.int8) - 8
    q = jnp.stack([lo, hi], axis=1).reshape(half_k * 2, *ids.shape)
    s = jnp.repeat(scales.astype(dtype), QK, axis=0)
    x = q.astype(dtype) * s  # [K, *ids.shape]
    return jnp.moveaxis(x, 0, -1)


# ---------------------------------------------------------------------------
# ggml wire-format interop (reference 20-byte interleaved blocks)
# ---------------------------------------------------------------------------


def from_ggml_q4_0_bytes(raw: np.ndarray, O: int, K: int, scale_dtype=DEFAULT_SCALE_DTYPE):
    """Convert the reference's on-disk Q4_0 stream to row-major (packed, scales).

    Reference layout per row: K//32 blocks of 20 bytes = [f32 d][16 nibble
    bytes], nibble byte j of block b = elements (32b+2j, 32b+2j+1)
    (ggml.c:213-247).  Our packed column index for that byte is 16b+j, so the
    nibble bytes concatenate directly.
    """
    nb = K // QK
    rec = np.frombuffer(np.ascontiguousarray(raw), dtype=np.uint8)
    rec = rec.reshape(O, nb, GGML_BLOCK_BYTES)
    scales = rec[:, :, 0:4].copy().view(np.float32).reshape(O, nb)
    packed = rec[:, :, 4:].reshape(O, K // 2).copy()
    return packed, scales.astype(scale_dtype)


def to_ggml_q4_0_bytes(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """Inverse of from_ggml_q4_0_bytes (row-major in) → reference byte stream."""
    O, half_k = packed.shape
    nb = half_k // (QK // 2)
    rec = np.empty((O, nb, GGML_BLOCK_BYTES), dtype=np.uint8)
    rec[:, :, 0:4] = (
        np.ascontiguousarray(scales.astype(np.float32)).view(np.uint8).reshape(O, nb, 4)
    )
    rec[:, :, 4:] = packed.reshape(O, nb, QK // 2)
    return rec.reshape(-1)
