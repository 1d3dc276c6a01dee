"""Native C++ runtime library vs numpy oracles — bit-exact equality.

Mirrors the reference's testing of accelerator code against its scalar
fallbacks (SURVEY.md §4.3: the .emax7nc software-emulation builds)."""

import numpy as np
import pytest

from vsim_tpu import native
from vsim_tpu.quant.q4 import (
    dequantize_q4_0_np,
    from_ggml_q4_0_bytes,
    quantize_q4_0_np,
    quantize_q4_0_with_hist_np,
    to_ggml_q4_0_bytes,
)

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable (no compiler)")

RNG = np.random.default_rng(7)


def _w(O=96, K=128):
    w = RNG.standard_normal((O, K)).astype(np.float32)
    w[3] = 0.0  # all-zero block: d == 0 path (q must be 8)
    return w


def test_quantize_matches_numpy():
    w = _w()
    pn, sn = quantize_q4_0_np(w, scale_dtype=np.float32)
    pc, sc = native.q4_quantize(w)
    np.testing.assert_array_equal(pc, pn)
    np.testing.assert_array_equal(sc, sn)


def test_quantize_histogram_matches():
    w = _w(64, 256)
    _, _, hn = quantize_q4_0_with_hist_np(w, scale_dtype=np.float32)
    _, _, hc = native.q4_quantize(w, with_hist=True)
    np.testing.assert_array_equal(hc, hn)
    assert hc.sum() == 64 * 256


def test_dequantize_matches_numpy():
    w = _w()
    p, s = quantize_q4_0_np(w, scale_dtype=np.float32)
    np.testing.assert_array_equal(
        native.q4_dequantize(p, s), dequantize_q4_0_np(p, s))


def test_ggml_to_kmajor_roundtrip():
    w = _w(64, 192)
    p, s = quantize_q4_0_np(w, scale_dtype=np.float32)
    raw = to_ggml_q4_0_bytes(p, s)

    pk, sk = native.ggml_to_kmajor(raw, 64, 192, scale_dtype=np.float32)
    # oracle: row-major parse then transpose
    po, so = from_ggml_q4_0_bytes(raw, 64, 192, np.float32)
    np.testing.assert_array_equal(pk, po.T)
    np.testing.assert_array_equal(sk, so.T)

    # inverse returns the exact byte stream
    np.testing.assert_array_equal(native.kmajor_to_ggml(pk, sk), raw)


def test_ggml_to_kmajor_bf16_scales():
    import ml_dtypes

    w = _w(32, 64)
    p, s = quantize_q4_0_np(w, scale_dtype=np.float32)
    raw = to_ggml_q4_0_bytes(p, s)
    pk, sk = native.ggml_to_kmajor(raw, 32, 64)
    assert sk.dtype == np.dtype(ml_dtypes.bfloat16)
    # native f32->bf16 must match ml_dtypes round-to-nearest-even
    np.testing.assert_array_equal(
        sk.view(np.uint16), s.T.astype(ml_dtypes.bfloat16).view(np.uint16))


def test_f16_widening_matches_numpy():
    h = RNG.standard_normal(4096).astype(np.float16)
    # include specials: subnormals, inf, nan, zero
    h[0] = np.float16(6e-8)
    h[1] = np.inf
    h[2] = -np.inf
    h[3] = 0.0
    h[4] = np.float16(65504)
    out = native.f16_to_f32(h)
    ref = h.astype(np.float32)
    np.testing.assert_array_equal(out[1:], ref[1:])
    np.testing.assert_array_equal(out[:1], ref[:1])
