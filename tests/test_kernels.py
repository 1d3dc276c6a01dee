"""Pallas fused dequant+matmul vs the XLA oracle.

Mirrors the reference's dual-path verification strategy: the CGRA kernel was
validated against the scalar CPU loop via the `.emax7nc` software emulation
(SURVEY.md §4.3) — here interpret-mode Pallas vs dequant+einsum."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsim_tpu.ops.matmul import q4_matmul
from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul
from vsim_tpu.quant.q4 import Q4Tensor

INTERPRET = jax.default_backend() != "tpu"


def _mk(O, K, seed):
    rng = np.random.default_rng(seed)
    w = (rng.standard_normal((O, K)) * 0.1).astype(np.float32)
    return Q4Tensor.from_dense_np(w, scale_dtype=np.float32)


@pytest.mark.parametrize(
    "n,O,K",
    [
        (1, 256, 512),  # decode GEMV
        (4, 512, 1024),  # small batch decode
        (8, 256, 256),  # single k-tile
        (3, 384, 1152),  # non-pow2 multiples of (128, 32)
        (16, 1024, 2048),  # multi-tile both dims
    ],
)
def test_pallas_matches_xla(n, O, K):
    w = _mk(O, K, seed=O + K)
    rng = np.random.default_rng(n)
    x = jnp.asarray((rng.standard_normal((n, K)) * 0.5).astype(np.float32))
    ref = q4_matmul(x, w, impl="xla")
    got = pallas_q4_matmul(x, w, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_pallas_batched_lead_dims():
    w = _mk(256, 512, seed=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray((rng.standard_normal((2, 3, 512)) * 0.5).astype(np.float32))
    ref = q4_matmul(x, w, impl="xla")
    got = pallas_q4_matmul(x, w, interpret=INTERPRET)
    assert got.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_pallas_fp16_scales():
    rng = np.random.default_rng(5)
    w_dense = (rng.standard_normal((256, 512)) * 0.1).astype(np.float32)
    w = Q4Tensor.from_dense_np(w_dense, scale_dtype=np.float16)
    x = jnp.asarray((rng.standard_normal((2, 512)) * 0.5).astype(np.float32))
    ref = q4_matmul(x, w, impl="xla")
    got = pallas_q4_matmul(x, w, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5,
                               atol=2e-5)


def test_pallas_stacked_scalar_prefetch():
    """Stacked-layer kernel: selecting layer il inside the kernel must equal
    the per-layer kernel on the sliced weight, for every layer."""
    from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul_stacked

    L, O, K = 3, 256, 512
    rng = np.random.default_rng(7)
    dense = (rng.standard_normal((L, O, K)) * 0.1).astype(np.float32)
    stacked = Q4Tensor.from_dense_np(dense, scale_dtype=np.float32)
    x = jnp.asarray((rng.standard_normal((4, K)) * 0.5).astype(np.float32))
    for il in range(L):
        one = Q4Tensor(packed=stacked.packed[il], scales=stacked.scales[il])
        ref = q4_matmul(x, one, impl="xla")
        exact = pallas_q4_matmul_stacked(x, stacked, il, interpret=INTERPRET,
                                         acc_dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(exact), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)
        # default bf16 MXU inputs: quantization-noise-level tolerance
        fast = pallas_q4_matmul_stacked(x, stacked, il, interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


def test_pick_blocks_invariants():
    """Tile geometry must always divide the operand and keep at least one Q4
    block per tile.  Regression: gpt2's MLP proj (half_k=1536, O=768) hit a
    non-divisor area cap (1365) that decayed the halving loop to
    block_kh=1 → a zero-row scales tile → ZeroDivisionError on TPU."""
    from vsim_tpu.ops.pallas_q4 import _pick_blocks

    shapes = [(1536, 768), (384, 768), (384, 3072), (1536, 3072),
              (2048, 4096), (8192, 4096), (2048, 50432), (256, 256),
              (2048, 12288), (2048, 16384)]
    for half_k, O in shapes:
        for n in (8, 16, 32, 64, 128):
            bo, bkh = _pick_blocks(half_k, O, n)
            assert O % bo == 0, (half_k, O, n, bo)
            assert half_k % bkh == 0, (half_k, O, n, bkh)
            assert bkh >= 16 and bkh % 16 == 0, (half_k, O, n, bkh)


def test_pallas_gpt2_proj_shape():
    """The exact shape class that broke: stacked kernel at gpt2's
    w_proj [K=3072, O=768] with a decode-sized batch."""
    from vsim_tpu.ops.pallas_q4 import pallas_q4_matmul_stacked

    L, O, K = 2, 768, 3072
    rng = np.random.default_rng(11)
    dense = (rng.standard_normal((L, O, K)) * 0.1).astype(np.float32)
    stacked = Q4Tensor.from_dense_np(dense, scale_dtype=np.float32)
    x = jnp.asarray((rng.standard_normal((1, K)) * 0.5).astype(np.float32))
    one = Q4Tensor(packed=stacked.packed[0], scales=stacked.scales[0])
    ref = q4_matmul(x, one, impl="xla")
    got = pallas_q4_matmul_stacked(x, stacked, 0, interpret=INTERPRET,
                                   acc_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("act", ["gelu_tanh", "gelu_exact", "relu"])
def test_fused_mlp_ps_parity(act):
    """Fused fc+act+proj kernel (interpret) == exact two-matmul reference
    for every supported activation.  gelu_exact exercises the in-kernel A&S
    erf polynomial (Mosaic lacks erf/erfc; ADVICE r3: the branch was dead
    until the polynomial made it routable)."""
    from vsim_tpu.ops.pallas_q4 import pallas_q4_mlp_ps
    from vsim_tpu.quant.q4 import dequantize_km, to_plane_split

    E, F = 512, 1024
    rng = np.random.default_rng(13)
    wfc = Q4Tensor.from_dense_np(
        (rng.standard_normal((F, E)) * 0.1).astype(np.float32))
    wproj = Q4Tensor.from_dense_np(
        (rng.standard_normal((E, F)) * 0.1).astype(np.float32))
    bfc = jnp.asarray(rng.standard_normal((F,)), jnp.float32) * 0.1
    bproj = jnp.asarray(rng.standard_normal((E,)), jnp.float32) * 0.1
    for n in (1, 4):
        x = jnp.asarray(rng.standard_normal((n, E)), jnp.float32)
        h = x @ dequantize_km(wfc, jnp.float32) + bfc
        if act == "gelu_tanh":
            h = jax.nn.gelu(h, approximate=True)
        elif act == "gelu_exact":
            h = jax.nn.gelu(h, approximate=False)
        else:
            h = jnp.maximum(h, 0)
        ref = np.asarray(h @ dequantize_km(wproj, jnp.float32) + bproj)
        got = np.asarray(pallas_q4_mlp_ps(
            x, to_plane_split(wfc), bfc, to_plane_split(wproj), bproj,
            act=act, interpret=True))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_erf_poly_accuracy():
    """A&S 7.1.26 is 1.5e-7 in f64; f32 intermediate rounding lands ~2e-6
    (measured) — 3 orders below bf16 resolution, the compute dtype the
    model actually runs."""
    from vsim_tpu.ops.pallas_q4 import _erf_poly

    x = jnp.linspace(-6.0, 6.0, 4001)
    err = np.abs(np.asarray(_erf_poly(x)) - np.asarray(jax.lax.erf(x)))
    assert err.max() < 5e-6, err.max()


def test_q4layer_dispatch_matches_slice():
    """q4_matmul on a Q4Layer must equal q4_matmul on the sliced Q4Tensor."""
    from vsim_tpu.ops.matmul import Q4Layer

    L, O, K = 2, 128, 256
    rng = np.random.default_rng(9)
    dense = (rng.standard_normal((L, O, K)) * 0.1).astype(np.float32)
    stacked = Q4Tensor.from_dense_np(dense, scale_dtype=np.float32)
    x = jnp.asarray((rng.standard_normal((2, K)) * 0.5).astype(np.float32))
    for il in range(L):
        one = Q4Tensor(packed=stacked.packed[il], scales=stacked.scales[il])
        ref = q4_matmul(x, one, impl="xla")
        got = q4_matmul(x, Q4Layer(stacked, jnp.int32(il)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=0, atol=0)
