"""Fused decode-attention kernel vs the XLA einsum oracle.

The kernel (ops/decode_attention.py) collapses the reference's per-token
KQ/mask/softmax/KQV graph chain (vsim.cpp:573-615) into one VMEM pass over
the stacked int8 KV cache.  Run here in interpret mode on the CPU mesh —
the same strategy the reference used for its CGRA code (`.emax7nc`
software emulation, SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vsim_tpu.models.transformer import _kv_write, init_cache
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.ops.decode_attention import (
    decode_attention_int8,
    decode_attention_oracle,
    set_decode_kernel,
)


def _mk_cache(L, B, H, S, D, n_fill, seed=0, kv_dtype="int8"):
    """Quantized cache with n_fill real positions per (layer, batch)."""
    cfg = ModelConfig(arch="gptneox", n_vocab=32, n_ctx=S, n_embd=H * D,
                      n_head=H, n_layer=L, n_ff=16, n_rot=0,
                      kv_dtype=kv_dtype)
    cache = init_cache(cfg, B)
    rng = np.random.default_rng(seed)
    k_all, v_all = cache["k"], cache["v"]
    for il in range(L):
        new_k = jnp.asarray(rng.standard_normal((B, n_fill, H, D)),
                            jnp.float32)
        new_v = jnp.asarray(rng.standard_normal((B, n_fill, H, D)),
                            jnp.float32)
        k_all = _kv_write(k_all, new_k, jnp.int32(il), jnp.int32(0), False,
                          B, n_fill)
        v_all = _kv_write(v_all, new_v, jnp.int32(il), jnp.int32(0), False,
                          B, n_fill)
    return k_all, v_all


@pytest.mark.parametrize("n_past", [0, 5, 63])
def test_kernel_matches_oracle(n_past):
    L, B, H, S, D = 2, 2, 4, 128, 128
    k_all, v_all = _mk_cache(L, B, H, S, D, n_fill=n_past + 1)
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    for il in range(L):
        ref = decode_attention_oracle(
            q, k_all, v_all, il, n_past, kv_len=S, scale=D ** -0.5)
        got = decode_attention_int8(
            q, k_all, v_all, jnp.int32(il), jnp.int32(n_past), kv_len=S,
            scale=D ** -0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("n_past", [0, 63])
@pytest.mark.parametrize("D", [64, 80, 96, 128, 256])
def test_kernel_matches_oracle_int4(n_past, D):
    """Plane-packed int4 store: kernel unpack must equal the XLA dequant —
    at EVERY zoo head dim (r4 gated the kernel at D % 256, serving the
    fused path to GPT-J alone; r5 lifted it after the attn_gate_probe
    showed Mosaic handles any sublane-multiple packed minor dim)."""
    L, B, H, S = 2, 2, 2, 128
    k_all, v_all = _mk_cache(L, B, H, S, D, n_fill=n_past + 1,
                             kv_dtype="int4")
    assert k_all[0].dtype == jnp.uint8
    rng = np.random.default_rng(42)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    for il in range(L):
        ref = decode_attention_oracle(
            q, k_all, v_all, il, n_past, kv_len=S, scale=D ** -0.5)
        got = decode_attention_int8(
            q, k_all, v_all, jnp.int32(il), jnp.int32(n_past), kv_len=S,
            scale=D ** -0.5, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("n_head", [2, 4])  # head_dim 256 and 128 (pythia)
def test_forward_integration_int4_kernel_vs_einsum(n_head):
    """Full int4-KV decode steps with the kernel on vs off must agree, at
    both a 256 and a 128 (pythia-12b-class) head dim."""
    from vsim_tpu.models.init import init_params
    from vsim_tpu.models.transformer import forward, init_cache

    cfg = ModelConfig(arch="gptneox", n_vocab=64, n_ctx=128, n_embd=512,
                      n_head=n_head, n_layer=2, n_ff=128, n_rot=32,
                      kv_dtype="int4")
    params = init_params(cfg, seed=0, quantize=False)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)

    def run():
        cache = init_cache(cfg, 1)
        logits, cache = forward(cfg, params, ids, cache, 0, kv_len=128)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        outs = []
        for step in range(3):
            logits, cache = forward(cfg, params, tok[:, None], cache,
                                    jnp.int32(8 + step), kv_len=128)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            outs.append(np.asarray(logits))
        return outs

    set_decode_kernel("off")
    try:
        ref = run()
    finally:
        set_decode_kernel("on")
    try:
        got = run()
    finally:
        set_decode_kernel("auto")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-2, atol=2e-2)


def test_kernel_ragged_n_past():
    L, B, H, S, D = 1, 3, 2, 256, 128
    k_all, v_all = _mk_cache(L, B, H, S, D, n_fill=100)
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    n_past = jnp.asarray([3, 57, 99], jnp.int32)
    ref = decode_attention_oracle(
        q, k_all, v_all, 0, n_past, kv_len=S, scale=D ** -0.5)
    got = decode_attention_int8(
        q, k_all, v_all, jnp.int32(0), n_past, kv_len=S,
        scale=D ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("kv_dtype,D", [("int8", 256), ("int4", 256),
                                        ("int8", 96), ("int4", 128),
                                        ("int4", 80), ("int4", 64)])
def test_kernel_fresh_rows_deferred_write(kv_dtype, D):
    """Deferred-write mode: attending {cache rows < n_past} + the fresh
    quantized token in-kernel must equal write-then-attend, and the
    post-hoc all-layer scatter must produce the identical cache (the r4
    serving-gap fix: 56 ragged scatters -> 1).  Parametrized over the zoo
    head dims so the r5 gate lift (pythia-12b D=128 int4 = the serving
    north star) keeps the bit-parity contract."""
    from vsim_tpu.models.transformer import (
        _kv_apply_deferred, _kv_quantize, _kv_quantize4, _is_packed4)

    L, B, H, S = 2, 3, 2, 256
    k_all, v_all = _mk_cache(L, B, H, S, D, n_fill=100, kv_dtype=kv_dtype)
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    k_new = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    n_past = jnp.asarray([3, 57, 99], jnp.int32)

    # oracle: per-layer ragged writes, then attend with mask <= n_past
    k_ref, v_ref = k_all, v_all
    for il in range(L):
        k_ref = _kv_write(k_ref, k_new, jnp.int32(il), n_past, True, B, 1)
        v_ref = _kv_write(v_ref, v_new, jnp.int32(il), n_past, True, B, 1)
    refs = [decode_attention_oracle(q, k_ref, v_ref, il, n_past, kv_len=S,
                                    scale=D ** -0.5) for il in range(L)]

    # deferred: quantize once, kernel merges the fresh rows, one scatter
    quant = _kv_quantize4 if _is_packed4(k_all) else _kv_quantize
    sdt = k_all[1].dtype
    knq, kns = quant(jnp.swapaxes(k_new, 1, 2), sdt)
    vnq, vns = quant(jnp.swapaxes(v_new, 1, 2), sdt)
    rows = (knq[:, :, 0], kns[:, :, 0], vnq[:, :, 0], vns[:, :, 0])
    for il in range(L):
        got = decode_attention_int8(
            q, k_all, v_all, jnp.int32(il), n_past, kv_len=S,
            scale=D ** -0.5, interpret=True, fresh_rows=rows)
        np.testing.assert_allclose(np.asarray(got), np.asarray(refs[il]),
                                   rtol=2e-2, atol=2e-2)
    kq_l = jnp.stack([rows[0]] * L)
    ks_l = jnp.stack([rows[1]] * L)
    vq_l = jnp.stack([rows[2]] * L)
    vs_l = jnp.stack([rows[3]] * L)
    k_got = _kv_apply_deferred(k_all, kq_l, ks_l, n_past)
    v_got = _kv_apply_deferred(v_all, vq_l, vs_l, n_past)
    for a, b in ((k_got, k_ref), (v_got, v_ref)):
        np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    # the production path: aliased pallas writer kernel (in-place on TPU;
    # the wrapper donates its cache args, so pass copies here)
    from vsim_tpu.ops.decode_attention import scatter_rows_inplace

    ref_k_np = (np.asarray(k_ref[0]), np.asarray(k_ref[1]))
    ref_v_np = (np.asarray(v_ref[0]), np.asarray(v_ref[1]))
    cp = lambda t: (jnp.array(t[0]), jnp.array(t[1]))  # noqa: E731
    k_got2, v_got2 = scatter_rows_inplace(
        cp(k_all), cp(v_all), (kq_l, ks_l, vq_l, vs_l), n_past,
        interpret=True)
    for a, b in ((k_got2, ref_k_np), (v_got2, ref_v_np)):
        np.testing.assert_array_equal(np.asarray(a[0]), b[0])
        np.testing.assert_array_equal(np.asarray(a[1]), b[1])
    # sentinel slots (n_past >= S) must write nothing
    k_s3, v_s3 = scatter_rows_inplace(
        cp(k_ref), cp(v_ref), (kq_l, ks_l, vq_l, vs_l),
        jnp.full((B,), S, jnp.int32), interpret=True)
    for a, b in ((k_s3, ref_k_np), (v_s3, ref_v_np)):
        np.testing.assert_array_equal(np.asarray(a[0]), b[0])
        np.testing.assert_array_equal(np.asarray(a[1]), b[1])


def test_forward_ragged_deferred_matches_einsum():
    """Full ragged serving forward: kernel-on (deferred writes) must match
    kernel-off (einsum, per-layer writes) — logits AND updated cache."""
    from vsim_tpu.models.config import ModelConfig
    from vsim_tpu.models.init import init_params
    from vsim_tpu.models.transformer import forward, init_cache

    cfg = ModelConfig(arch="gptneox", n_vocab=64, n_ctx=256, n_embd=512,
                      n_head=2, n_layer=2, n_ff=256, n_rot=32,
                      kv_dtype="int8")
    params = init_params(cfg, seed=0, quantize=False)
    tok = jnp.asarray([5, 9, 11], jnp.int32)
    n_past = jnp.asarray([3, 57, 99], jnp.int32)

    def run():
        cache = init_cache(cfg, 3)
        # fill some history so the ragged mask matters
        ids0 = jnp.asarray([[1, 2, 3, 4]] * 3, jnp.int32)
        _, cache = forward(cfg, params, ids0, cache, 0, kv_len=128,
                           fresh_kv=True)
        logits, cache = forward(cfg, params, tok[:, None], cache, n_past,
                                kv_len=128)
        return np.asarray(logits), cache

    set_decode_kernel("off")
    try:
        ref, cache_ref = run()
    finally:
        set_decode_kernel("on")
    try:
        got, cache_got = run()
    finally:
        set_decode_kernel("auto")
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
    # caches agree to quantization tolerance (later layers' inputs differ
    # at kernel-vs-einsum bf16 noise level, so rows can differ by an LSB)
    from vsim_tpu.models.transformer import _kv_read

    for side in ("k", "v"):
        for il in range(cfg.n_layer):
            a = np.asarray(_kv_read(cache_got[side], jnp.int32(il), None,
                                    jnp.float32))
            b = np.asarray(_kv_read(cache_ref[side], jnp.int32(il), None,
                                    jnp.float32))
            np.testing.assert_allclose(a, b, rtol=5e-2, atol=5e-2)


def test_kernel_kv_len_bucket():
    """kv_len < S must slice the attended prefix like the einsum path."""
    L, B, H, S, D = 1, 1, 2, 256, 128
    k_all, v_all = _mk_cache(L, B, H, S, D, n_fill=60)
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    ref = decode_attention_oracle(
        q, k_all, v_all, 0, 59, kv_len=128, scale=D ** -0.5)
    got = decode_attention_int8(
        q, k_all, v_all, jnp.int32(0), jnp.int32(59), kv_len=128,
        scale=D ** -0.5, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_kernel_alibi():
    L, B, H, S, D = 1, 1, 4, 128, 128
    k_all, v_all = _mk_cache(L, B, H, S, D, n_fill=40)
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.standard_normal((B, 1, H, D)), jnp.float32)
    from vsim_tpu.models.transformer import alibi_slopes

    sl = alibi_slopes(H)
    ref = decode_attention_oracle(
        q, k_all, v_all, 0, 39, kv_len=S, scale=D ** -0.5, slopes=sl)
    got = decode_attention_int8(
        q, k_all, v_all, jnp.int32(0), jnp.int32(39), kv_len=S,
        scale=D ** -0.5, slopes=sl, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_forward_integration_kernel_vs_einsum():
    """Full decode step through models/transformer.forward with the kernel
    forced on vs off — logits must agree."""
    from vsim_tpu.models.init import init_params
    from vsim_tpu.models.transformer import forward

    cfg = ModelConfig(arch="gptneox", n_vocab=64, n_ctx=128, n_embd=256,
                      n_head=2, n_layer=2, n_ff=128, n_rot=32,
                      kv_dtype="int8")
    params = init_params(cfg, seed=0, quantize=False)
    ids = jnp.asarray([[1, 2, 3, 4, 5, 6, 7, 8]], jnp.int32)

    def run():
        cache = init_cache(cfg, 1)
        logits, cache = forward(cfg, params, ids, cache, 0, kv_len=128)
        tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        outs = []
        for step in range(4):
            logits, cache = forward(cfg, params, tok[:, None], cache,
                                    jnp.int32(8 + step), kv_len=128)
            tok = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
            outs.append(np.asarray(logits))
        return outs

    set_decode_kernel("off")
    try:
        ref = run()
    finally:
        set_decode_kernel("on")
    try:
        got = run()
    finally:
        set_decode_kernel("auto")
    for r, g in zip(ref, got):
        np.testing.assert_allclose(g, r, rtol=2e-2, atol=2e-2)
