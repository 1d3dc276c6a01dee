"""Q4_0 quantization: bit-exactness vs a straight transliteration of the
reference formula (ggml.c:209-250), roundtrips, wire-format interop."""

import numpy as np
import jax.numpy as jnp
import pytest

from vsim_tpu.quant import (
    QK,
    dequantize_q4_0,
    dequantize_q4_0_np,
    fake_quantize,
    from_ggml_q4_0_bytes,
    q4_take_rows,
    quantize_q4_0,
    quantize_q4_0_np,
    quantize_q4_0_with_hist_np,
    to_ggml_q4_0_bytes,
)


def ggml_oracle_quantize_row(x: np.ndarray) -> bytes:
    """Scalar transliteration of quantize_row_q4_0 (ggml.c:209-250) used as the
    golden oracle.  Returns the 20-byte-per-block reference stream."""
    import math
    import struct

    k = x.shape[0]
    nb = k // QK
    out = bytearray()
    for i in range(nb):
        block = x[i * QK : (i + 1) * QK].astype(np.float32)
        amax = float(np.max(np.abs(block)))
        d = np.float32(amax / ((1 << 3) - 1))
        idv = np.float32(1.0 / d) if d else np.float32(0.0)
        out += struct.pack("<f", d)
        for l in range(0, QK, 2):
            v0 = float(np.float32(block[l]) * idv)
            v1 = float(np.float32(block[l + 1]) * idv)
            vi0 = int(np.int8(round(v0))) + 8  # C round = half away from zero
            vi1 = int(np.int8(round(v1))) + 8
            assert 0 <= vi0 < 16 and 0 <= vi1 < 16
            out.append(vi0 | (vi1 << 4))
    return bytes(out)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bit_exact_vs_ggml_oracle(seed):
    rng = np.random.default_rng(seed)
    O, K = 4, 128
    w = rng.standard_normal((O, K)).astype(np.float32)
    # include degenerate blocks: all zeros, single spike, negative-heavy
    w[0, :QK] = 0.0
    w[1, QK] = 100.0
    w[1, QK + 1 : 2 * QK] = 0.0

    packed, scales = quantize_q4_0_np(w, scale_dtype=np.float32)
    stream = to_ggml_q4_0_bytes(packed, scales)

    oracle = b"".join(ggml_oracle_quantize_row(w[i]) for i in range(O))
    assert bytes(stream.tobytes()) == oracle


def test_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 256)).astype(np.float32)
    packed, scales = quantize_q4_0_np(w, scale_dtype=np.float32)
    deq = dequantize_q4_0_np(packed, scales)
    # max error per element is d/2 = amax/14 per block
    amax = np.abs(w.reshape(8, -1, QK)).max(-1)
    bound = np.repeat(amax / 14.0 + 1e-7, QK, axis=-1)
    assert np.all(np.abs(deq - w) <= bound)


def test_double_quantize_fixed_point():
    # quantize(dequantize(q)) == q  (Q4_0 is idempotent on its own grid)
    rng = np.random.default_rng(3)
    w = rng.standard_normal((4, 64)).astype(np.float32)
    p1, s1 = quantize_q4_0_np(w, scale_dtype=np.float32)
    d1 = dequantize_q4_0_np(p1, s1)
    p2, s2 = quantize_q4_0_np(d1, scale_dtype=np.float32)
    assert np.array_equal(p1, p2)
    np.testing.assert_allclose(s1, s2, rtol=1e-6)


def test_jax_matches_numpy_packer():
    rng = np.random.default_rng(7)
    w = rng.standard_normal((16, 160)).astype(np.float32)
    pn, sn = quantize_q4_0_np(w, scale_dtype=np.float32)
    wt = quantize_q4_0(jnp.asarray(w), scale_dtype=jnp.float32)
    # Q4Tensor stores K-major (packed [K//2, O])
    assert wt.shape == (16, 160)
    assert np.array_equal(np.asarray(wt.packed), pn.T)
    np.testing.assert_allclose(np.asarray(wt.scales), sn.T, rtol=1e-6)
    deq_j = np.asarray(dequantize_q4_0(wt))
    np.testing.assert_allclose(deq_j, dequantize_q4_0_np(pn, sn), rtol=1e-6)


def test_from_dense_np_matches_jax_packer():
    from vsim_tpu.quant import Q4Tensor

    rng = np.random.default_rng(21)
    w = rng.standard_normal((8, 64)).astype(np.float32)
    a = Q4Tensor.from_dense_np(w, scale_dtype=np.float32)
    b = quantize_q4_0(jnp.asarray(w), scale_dtype=jnp.float32)
    assert np.array_equal(np.asarray(a.packed), np.asarray(b.packed))
    np.testing.assert_allclose(
        np.asarray(a.scales), np.asarray(b.scales), rtol=1e-6
    )


def test_fake_quantize_matches_roundtrip():
    rng = np.random.default_rng(9)
    w = rng.standard_normal((4, 96)).astype(np.float32)
    fq = np.asarray(fake_quantize(jnp.asarray(w)))
    pn, sn = quantize_q4_0_np(w, scale_dtype=np.float32)
    np.testing.assert_allclose(fq, dequantize_q4_0_np(pn, sn), rtol=1e-5, atol=1e-6)


def test_ggml_wire_roundtrip():
    rng = np.random.default_rng(11)
    w = rng.standard_normal((6, 64)).astype(np.float32)
    packed, scales = quantize_q4_0_np(w, scale_dtype=np.float32)
    stream = to_ggml_q4_0_bytes(packed, scales)
    p2, s2 = from_ggml_q4_0_bytes(stream, 6, 64, scale_dtype=np.float32)
    assert np.array_equal(packed, p2)
    np.testing.assert_allclose(scales, s2, rtol=0)


def test_take_rows():
    rng = np.random.default_rng(13)
    w = rng.standard_normal((10, 64)).astype(np.float32)
    wt = quantize_q4_0(jnp.asarray(w), scale_dtype=jnp.float32)
    ids = jnp.array([3, 0, 9])
    rows = np.asarray(q4_take_rows(wt, ids))
    full = dequantize_q4_0_np(*quantize_q4_0_np(w, scale_dtype=np.float32))
    np.testing.assert_allclose(rows, full[[3, 0, 9]], rtol=1e-6)


def test_histogram():
    rng = np.random.default_rng(17)
    w = rng.standard_normal((4, 128)).astype(np.float32)
    _, _, hist = quantize_q4_0_with_hist_np(w)
    assert hist.sum() == w.size
    assert hist.shape == (16,)


# ---------------------------------------------------------------------------
# Q4_1 (min + delta): reference ggml.c:252-299, 336-367; per-row planar
# serialization per ggml_quantize_q4_1 (utils.cpp:484-536)
# ---------------------------------------------------------------------------

from vsim_tpu.quant import (  # noqa: E402
    dequantize_q4_1_np,
    from_ggml_q4_1_bytes,
    quantize_q4_1_np,
    to_ggml_q4_1_bytes,
)


def ggml_oracle_quantize_row_q4_1(x: np.ndarray) -> bytes:
    """Scalar transliteration of ggml_quantize_q4_1 (utils.cpp:484-536):
    row = [nb f32 mins][nb f32 deltas][nb*16 nibble bytes]."""
    import math
    import struct

    k = x.shape[0]
    nb = k // QK
    mins, deltas, nibbles = [], [], bytearray()
    for i in range(nb):
        block = x[i * QK:(i + 1) * QK].astype(np.float32)
        mn, mx = block.min(), block.max()  # float32, like the C floats
        d = (mx - mn) / np.float32(15.0)
        idv = np.float32(1.0) / d if d else np.float32(0.0)
        mins.append(float(mn))
        deltas.append(float(d))
        for l in range(0, QK, 2):
            v0 = float((np.float32(block[l]) - np.float32(mn)) * idv)
            v1 = float((np.float32(block[l + 1]) - np.float32(mn)) * idv)
            # C round() = half away from zero (v0/v1 are >= 0 here)
            vi0, vi1 = int(math.floor(v0 + 0.5)), int(math.floor(v1 + 0.5))
            assert 0 <= vi0 < 16 and 0 <= vi1 < 16
            nibbles.append(vi0 | (vi1 << 4))
    return (struct.pack(f"<{nb}f", *mins) + struct.pack(f"<{nb}f", *deltas)
            + bytes(nibbles))


@pytest.mark.parametrize("seed", [0, 3])
def test_q4_1_bit_exact_vs_ggml_oracle(seed):
    rng = np.random.default_rng(seed)
    O, K = 3, 96
    w = rng.standard_normal((O, K)).astype(np.float32) + 0.5
    w[0, :QK] = 2.0  # constant block: d == 0 path
    packed, deltas, mins = quantize_q4_1_np(w)
    stream = to_ggml_q4_1_bytes(packed, deltas, mins)
    oracle = b"".join(ggml_oracle_quantize_row_q4_1(w[i]) for i in range(O))
    assert bytes(stream.tobytes()) == oracle


def test_q4_1_wire_roundtrip_and_error_bound():
    rng = np.random.default_rng(7)
    O, K = 8, 256
    w = rng.standard_normal((O, K)).astype(np.float32)
    packed, deltas, mins = quantize_q4_1_np(w)
    stream = to_ggml_q4_1_bytes(packed, deltas, mins)
    p2, d2, m2 = from_ggml_q4_1_bytes(stream, O, K)
    np.testing.assert_array_equal(p2, packed)
    np.testing.assert_array_equal(d2, deltas)
    np.testing.assert_array_equal(m2, mins)
    deq = dequantize_q4_1_np(p2, d2, m2)
    # max error <= delta/2 per element
    dmax = np.repeat(deltas, QK, axis=-1)
    assert np.all(np.abs(deq - w) <= dmax / 2 + 1e-6)


def test_q4_1_ggml_tensor_load(tmp_path):
    """A Q4_1 tensor in a ggml file loads (dense) instead of raising —
    reference quantizer CLIs accept ftype 3 (quantize_gptneox.cpp:34-38)."""
    from vsim_tpu.convert.ggml_file import FTYPE_Q4_1, GGMLTensor

    rng = np.random.default_rng(1)
    O, K = 4, 64
    w = rng.standard_normal((O, K)).astype(np.float32)
    packed, deltas, mins = quantize_q4_1_np(w)
    raw = to_ggml_q4_1_bytes(packed, deltas, mins)
    t = GGMLTensor("test.weight", (O, K), FTYPE_Q4_1, raw)
    deq = t.to_numpy()
    assert deq.shape == (O, K)
    np.testing.assert_allclose(deq, dequantize_q4_1_np(packed, deltas, mins))
    wgt = t.to_weight()
    assert wgt.shape == (O, K)


def test_plane_split_roundtrip():
    """to_plane_split preserves dequantized values exactly (byte c moves
    from elements 2c|2c+1 to c|c+K/2; scales untouched)."""
    import jax.numpy as jnp

    from vsim_tpu.quant.q4 import Q4Tensor, dequantize_km, to_plane_split

    rng = np.random.default_rng(5)
    w = Q4Tensor.from_dense_np(rng.standard_normal((96, 128)).astype(np.float32))
    ps = to_plane_split(w)
    assert ps.layout == "ps" and w.layout == "i"
    np.testing.assert_array_equal(
        np.asarray(dequantize_km(ps)), np.asarray(dequantize_km(w)))
    # idempotent + pad_out preserves layout
    assert to_plane_split(ps) is ps
    assert ps.pad_out(256).layout == "ps"


def test_plane_split_kernel_parity():
    """Glue-free ps kernel (interpret) == XLA oracle, N=1 and N=8.

    The default math (gi, r4) consumes activations in bf16 — exactly what
    the engine feeds it (compute_dtype bf16) — and is then INTEGER-EXACT:
    bf16 x times nibble values <= 15 is exact in f32, offset and scale are
    applied in f32 after accumulation.  So the parity oracle here uses
    bf16-rounded x and a tight tolerance (vs the 2e-2 the per-element-scale
    maths needed)."""
    import jax.numpy as jnp

    from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul_ps
    from vsim_tpu.quant.q4 import Q4Tensor, dequantize_km, to_plane_split

    rng = np.random.default_rng(6)
    w = Q4Tensor.from_dense_np(
        rng.standard_normal((512, 1024)).astype(np.float32))
    ps = to_plane_split(w)
    for n in (1, 8):
        x = jnp.asarray(rng.standard_normal((n, 1024)), jnp.float32)
        xb = x.astype(jnp.bfloat16).astype(jnp.float32)
        ref = np.asarray(xb @ dequantize_km(w, jnp.float32))
        got = np.asarray(pallas_q4_matmul_ps(
            x, ps, acc_dtype=jnp.float32, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)
