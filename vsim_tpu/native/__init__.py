"""ctypes binding to the native runtime library (vsim_native.cpp).

The reference's host runtime is all native (model load vsim.cpp:108-458,
quantize utils.cpp:425-482); here the bulk byte-level transforms — ggml
stream ↔ K-major repack, Q4 quantize/dequantize, f16 widening — run in
multithreaded C++ when ``libvsim_native.so`` is available, with transparent
numpy fallbacks otherwise.

``available()`` reports which path is active; the library auto-builds from
source on first import when a compiler is present (make -C vsim_tpu/native).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libvsim_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False
_lock = threading.Lock()

_u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
_f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
_i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
_i64 = ctypes.c_int64


def _build() -> bool:
    try:
        r = subprocess.run(
            ["make", "-C", _DIR, "-s"],
            capture_output=True, timeout=120,
        )
        return r.returncode == 0 and os.path.exists(_SO)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SO) and os.environ.get(
                "VSIM_TPU_NO_NATIVE_BUILD") is None:
            _build()
        if not os.path.exists(_SO):
            return None
        try:
            lib = ctypes.CDLL(_SO)
            lib.vsim_native_abi_version.restype = ctypes.c_int
            if lib.vsim_native_abi_version() != 1:
                return None
            lib.q4_quantize_f32.argtypes = [
                _f32p, _i64, _i64, _u8p, _f32p, ctypes.c_void_p]
            lib.q4_dequantize_f32.argtypes = [_u8p, _f32p, _i64, _i64, _f32p]
            lib.q4_ggml_to_kmajor.argtypes = [
                _u8p, _i64, _i64, _u8p, ctypes.c_void_p, ctypes.c_int]
            lib.q4_kmajor_to_ggml.argtypes = [_u8p, _f32p, _i64, _i64, _u8p]
            lib.u8_transpose.argtypes = [_u8p, _i64, _i64, _u8p]
            lib.f16_to_f32_buf.argtypes = [_u16p, _i64, _f32p]
            _lib = lib
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


# ---------------------------------------------------------------------------
# public transforms (native when possible, numpy fallback otherwise)
# ---------------------------------------------------------------------------


def q4_quantize(w: np.ndarray, with_hist: bool = False):
    """f32 [O, K] → (packed u8 [O, K/2], scales f32 [O, K/32][, hist i64[16]]).

    Reference numerics: d = amax/7, q = round-half-away(v/d)+8
    (ggml.c:209-250); histogram as in utils.cpp:425-482.
    """
    lib = _load()
    w = np.ascontiguousarray(w, np.float32)
    O, K = w.shape
    if lib is not None:
        packed = np.empty((O, K // 2), np.uint8)
        scales = np.empty((O, K // 32), np.float32)
        hist = np.zeros(16, np.int64) if with_hist else None
        lib.q4_quantize_f32(
            w, O, K, packed, scales,
            hist.ctypes.data_as(ctypes.c_void_p) if with_hist else None)
        return (packed, scales, hist) if with_hist else (packed, scales)
    from vsim_tpu.quant.q4 import (
        quantize_q4_0_np,
        quantize_q4_0_with_hist_np,
    )

    if with_hist:
        return quantize_q4_0_with_hist_np(w, scale_dtype=np.float32)
    return quantize_q4_0_np(w, scale_dtype=np.float32)


def q4_dequantize(packed: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """(packed u8 [O, K/2], scales [O, K/32]) → f32 [O, K]."""
    lib = _load()
    packed = np.ascontiguousarray(packed, np.uint8)
    scales = np.ascontiguousarray(scales, np.float32)
    O, half_k = packed.shape
    if lib is not None:
        out = np.empty((O, half_k * 2), np.float32)
        lib.q4_dequantize_f32(packed, scales, O, half_k * 2, out)
        return out
    from vsim_tpu.quant.q4 import dequantize_q4_0_np

    return dequantize_q4_0_np(packed, scales)


def ggml_to_kmajor(raw: np.ndarray, O: int, K: int, scale_dtype=None
                   ) -> Tuple[np.ndarray, np.ndarray]:
    """ggml 20-byte-block stream → (packed u8 [K/2, O], scales [K/32, O]).

    The hot model-load transform (one pass over multi-GB weight payloads).
    scale_dtype: np.float32 or ml_dtypes.bfloat16 (default).
    """
    import ml_dtypes as _md

    if scale_dtype is None:
        scale_dtype = np.dtype(_md.bfloat16)
    scale_dtype = np.dtype(scale_dtype)
    lib = _load()
    raw = np.ascontiguousarray(np.asarray(raw).view(np.uint8).reshape(-1))
    if lib is not None:
        packed = np.empty((K // 2, O), np.uint8)
        bf16 = scale_dtype == np.dtype(_md.bfloat16)
        scales = np.empty((K // 32, O), np.uint16 if bf16 else np.float32)
        lib.q4_ggml_to_kmajor(
            raw, O, K, packed, scales.ctypes.data_as(ctypes.c_void_p),
            1 if bf16 else 0)
        scales = (scales.view(scale_dtype) if bf16
                  else scales.astype(scale_dtype, copy=False))
        return packed, scales
    from vsim_tpu.quant.q4 import from_ggml_q4_0_bytes

    packed_rm, scales_rm = from_ggml_q4_0_bytes(raw, O, K, scale_dtype)
    return (np.ascontiguousarray(packed_rm.T),
            np.ascontiguousarray(scales_rm.T))


def kmajor_to_ggml(packed_km: np.ndarray, scales_km: np.ndarray) -> np.ndarray:
    """(packed u8 [K/2, O], f32 scales [K/32, O]) → ggml byte stream."""
    lib = _load()
    packed_km = np.ascontiguousarray(packed_km, np.uint8)
    scales_km = np.ascontiguousarray(scales_km, np.float32)
    half_k, O = packed_km.shape
    K = half_k * 2
    if lib is not None:
        raw = np.empty(O * (K // 32) * 20, np.uint8)
        lib.q4_kmajor_to_ggml(packed_km, scales_km, O, K, raw)
        return raw
    from vsim_tpu.quant.q4 import to_ggml_q4_0_bytes

    return to_ggml_q4_0_bytes(
        np.ascontiguousarray(packed_km.T), np.ascontiguousarray(scales_km.T))


def f16_to_f32(buf: np.ndarray) -> np.ndarray:
    """f16 payload → f32 (model files' ftype-1 tensors)."""
    lib = _load()
    flat = np.ascontiguousarray(buf).view(np.uint16).reshape(-1)
    if lib is not None:
        out = np.empty(flat.shape, np.float32)
        lib.f16_to_f32_buf(flat, flat.size, out)
        return out.reshape(buf.shape)
    return np.asarray(buf, np.float16).astype(np.float32)
