"""Parameter initialization: random models in our pytree layout.

Used for tests, benchmarks (weights streamed at real size without a real
checkpoint), and the training path.  Checkpoint loading lives in
vsim_tpu/convert/.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.quant.q4 import (  # noqa: F401
    DEFAULT_SCALE_DTYPE,
    QK,
    Q4Tensor,
    quantize_q4_0_np,
)

_WEIGHT_SHAPES = {
    "wq": ("E", "E"), "wk": ("E", "E"), "wv": ("E", "E"), "wo": ("E", "E"),
    "w_fc": ("F", "E"), "w_proj": ("E", "F"),
}
_VEC_SHAPES = {
    "ln1_w": ("E",), "ln1_b": ("E",), "ln2_w": ("E",), "ln2_b": ("E",),
    "bq": ("E",), "bk": ("E",), "bv": ("E",), "bo": ("E",),
    "b_fc": ("F",), "b_proj": ("E",),
}


def _dims(cfg: ModelConfig) -> Dict[str, int]:
    return {"E": cfg.n_embd, "F": cfg.n_ff, "V": cfg.n_vocab}


def init_params(
    cfg: ModelConfig,
    seed: int = 0,
    *,
    quantize: bool = False,
    scale_dtype=DEFAULT_SCALE_DTYPE,
    param_dtype=jnp.float32,
    std: float = 0.02,
) -> Dict[str, Any]:
    """Gaussian-init parameters (layer-stacked), optionally Q4_0-quantized.

    Quantization is done layer-by-layer so peak host memory stays at one
    un-stacked matrix.
    """
    rng = np.random.default_rng(seed)
    dims = _dims(cfg)
    L = cfg.n_layer

    def w(shape_names):
        shape = tuple(dims[s] for s in shape_names)
        return (rng.standard_normal(shape) * std).astype(np.float32)

    def wrap2d(mat):
        if quantize and mat.shape[-1] % QK == 0:
            p, s = quantize_q4_0_np(mat, scale_dtype=scale_dtype)
            return np.ascontiguousarray(p.T), np.ascontiguousarray(s.T)  # K-major
        return mat, None

    layer_packed: Dict[str, list] = {k: [] for k in _WEIGHT_SHAPES}
    layer_scales: Dict[str, list] = {k: [] for k in _WEIGHT_SHAPES}
    layer_vecs: Dict[str, list] = {k: [] for k in _VEC_SHAPES}
    for _ in range(L):
        for k, sh in _WEIGHT_SHAPES.items():
            p, s = wrap2d(w(sh))
            layer_packed[k].append(p)
            layer_scales[k].append(s)
        for k, sh in _VEC_SHAPES.items():
            base = np.ones if k.endswith("_w") or k == "ln2_w" else np.zeros
            layer_vecs[k].append(
                base(tuple(dims[s] for s in sh), dtype=np.float32)
                if k.startswith("ln")
                else w(sh)
            )

    layers: Dict[str, Any] = {}
    for k in _WEIGHT_SHAPES:
        stacked = np.stack(layer_packed[k])
        if layer_scales[k][0] is not None:
            layers[k] = Q4Tensor(
                packed=jnp.asarray(stacked),
                scales=jnp.asarray(np.stack(layer_scales[k])),
            )
        else:
            layers[k] = jnp.asarray(stacked, dtype=param_dtype)
    for k in _VEC_SHAPES:
        layers[k] = jnp.asarray(np.stack(layer_vecs[k]), dtype=param_dtype)

    def big(shape):
        mat = (rng.standard_normal(shape) * std).astype(np.float32)
        p, s = wrap2d(mat)
        if s is not None:
            return Q4Tensor(packed=jnp.asarray(p), scales=jnp.asarray(s))
        return jnp.asarray(p, dtype=param_dtype)

    params: Dict[str, Any] = {
        "wte": big((cfg.n_vocab, cfg.n_embd)),
        "layers": layers,
        "ln_f_w": jnp.ones((cfg.n_embd,), param_dtype),
        "ln_f_b": jnp.zeros((cfg.n_embd,), param_dtype),
        "lm_head": big((cfg.n_vocab, cfg.n_embd)),
    }
    if cfg.learned_pos:
        params["wpe"] = jnp.asarray(
            (rng.standard_normal((cfg.n_ctx, cfg.n_embd)) * std).astype(np.float32),
            dtype=param_dtype,
        )
    if cfg.arch == "bloom":
        params["emb_ln_w"] = jnp.ones((cfg.n_embd,), param_dtype)
        params["emb_ln_b"] = jnp.zeros((cfg.n_embd,), param_dtype)
    if cfg.final_logit_bias:
        params["lm_head_b"] = jnp.zeros((cfg.n_vocab,), param_dtype)
    return params


def random_q4_params(cfg: ModelConfig, seed: int = 0,
                     scale_dtype=DEFAULT_SCALE_DTYPE,
                     unstacked: bool = False):
    """Benchmark-grade Q4 params: random *packed bytes* directly (no float
    materialization/quantization pass — instant even at 6B scale; the memory
    traffic is identical to a real checkpoint, which is what a decode
    benchmark measures).

    ``unstacked=True`` emits per-layer TUPLES (the unrolled decode layout)
    straight from the generator — no stacked copy ever exists on device, so
    models whose stacked+unstacked transient exceeds HBM (gpt-neox-20b:
    11.4 GB weights + a 3.8 GB fc group) still fit."""
    rng = np.random.default_rng(seed)
    dims = _dims(cfg)
    L = cfg.n_layer

    def q4_one(O, K):
        packed = rng.integers(0, 256, size=(K // 2, O), dtype=np.uint8)
        scales = (rng.random((K // QK, O), dtype=np.float32) * 0.01).astype(
            scale_dtype)
        return Q4Tensor(packed=jnp.asarray(packed), scales=jnp.asarray(scales))

    def q4(shape_names, stacked=True):
        O, K = (dims[s] for s in shape_names)
        if not stacked:
            return q4_one(O, K)
        if unstacked:
            return tuple(q4_one(O, K) for _ in range(L))
        packed = rng.integers(0, 256, size=(L, K // 2, O), dtype=np.uint8)
        scales = (rng.random((L, K // QK, O), dtype=np.float32) * 0.01).astype(
            scale_dtype
        )
        return Q4Tensor(packed=jnp.asarray(packed), scales=jnp.asarray(scales))

    layers: Dict[str, Any] = {k: q4(sh) for k, sh in _WEIGHT_SHAPES.items()}
    for k, sh in _VEC_SHAPES.items():
        shape = (L, *(dims[s] for s in sh))
        layers[k] = (
            jnp.ones(shape, jnp.float32)
            if k.startswith("ln") and k.endswith("_w")
            else jnp.zeros(shape, jnp.float32)
        )
    params: Dict[str, Any] = {
        "wte": q4(("V", "E"), stacked=False),
        "layers": layers,
        "ln_f_w": jnp.ones((cfg.n_embd,), jnp.float32),
        "ln_f_b": jnp.zeros((cfg.n_embd,), jnp.float32),
        "lm_head": q4(("V", "E"), stacked=False),
    }
    if cfg.learned_pos:
        params["wpe"] = jnp.zeros((cfg.n_ctx, cfg.n_embd), jnp.float32)
    if cfg.arch == "bloom":
        params["emb_ln_w"] = jnp.ones((cfg.n_embd,), jnp.float32)
        params["emb_ln_b"] = jnp.zeros((cfg.n_embd,), jnp.float32)
    if cfg.final_logit_bias:
        params["lm_head_b"] = jnp.zeros((cfg.n_vocab,), jnp.float32)
    return params


def unstack_layer_params(params: Dict[str, Any], *,
                         consume: bool = False) -> Dict[str, Any]:
    """Split each layer-stacked Q4 weight into a TUPLE of per-layer
    Q4Tensors (separate device buffers).

    This feeds the unrolled decode path (models/transformer.py:forward with
    per-layer weights): each layer's matmul then runs the FLAT Pallas kernel
    on its own buffer instead of the scalar-prefetch stacked kernel, whose
    layer-indexed tile fetches measured 3.6-7.6 us/tile vs 2.0 flat at
    identical tile shapes (BASELINE.md r2; the two-round B=1 decode wall).

    Non-Q4 entries (LN weights, biases — dense-weight models too) stay
    stacked: a static ``v[il]`` slice of a small array fuses in XLA.

    Memory: groups are unstacked one at a time.  With ``consume=True`` the
    input's OWN layers dict is emptied as groups are copied, so each stacked
    buffer frees even while callers still hold the input pytree — peak
    device use is weights + one group (~1.9 GB for pythia-12b's fc).
    Without it the input stays intact (tests that compare both layouts) and
    the peak is 2x weights — pythia-12b OOMed a 16 GB chip that way.
    """
    import jax

    old_layers = params["layers"] if consume else dict(params["layers"])
    layers: Dict[str, Any] = {}
    for k in list(old_layers):
        v = old_layers.pop(k) if consume else old_layers[k]
        if isinstance(v, Q4Tensor) and v.packed.ndim == 3:
            L = v.packed.shape[0]
            per = tuple(
                Q4Tensor(packed=v.packed[i], scales=v.scales[i])
                for i in range(L)
            )
            # materialize the slices before dropping the stack — with a
            # value fetch: block_until_ready is enqueue-only through the
            # axon tunnel and the async pipeline otherwise allocates every
            # group's copies before any complete
            jax.block_until_ready([t.packed for t in per])
            per[-1].packed[0, 0].item()
            del v
            layers[k] = per
        else:
            layers[k] = v
    return dict(params, layers=layers)


def prepare_unrolled_params(params: Dict[str, Any], *,
                            consume: bool = True,
                            plane_split: bool = True) -> Dict[str, Any]:
    """Unstack + plane-split repack for the decode fast path (the shared
    engine-load transform: InferenceEngine and single-device ServingEngine).
    ``consume=True`` frees each stacked group as it is copied (see
    unstack_layer_params).  Plane-split applies only to K % 512 == 0 weights
    (Mosaic needs >= 8 scale rows per tile) and to the lm_head."""
    params = unstack_layer_params(params, consume=consume)
    if not plane_split:
        return params
    from vsim_tpu.quant.q4 import to_plane_split

    def _eligible(t):
        return t.in_features % 512 == 0

    layers = params["layers"]  # sole owner after unstack: mutate in place
    for k in list(layers):
        v = layers[k]
        if (isinstance(v, tuple) and v and isinstance(v[0], Q4Tensor)
                and _eligible(v[0])):
            # element-wise consume: each interleaved layer frees as soon as
            # its plane-split copy exists (building the whole new tuple
            # first doubles the group — 3.3 GB for gpt-neox-20b's fc)
            lst = list(v)
            layers[k] = lst
            v = None
            for i in range(len(lst)):
                lst[i] = to_plane_split(lst[i])
                # HARD sync (scalar fetch): async dispatch otherwise
                # enqueues every layer's repack at once, allocating all
                # their outputs+temporaries before any complete —
                # gpt-neox-20b OOMed with errors surfacing at later ops
                # (block_until_ready does not block through the axon
                # tunnel)
                lst[i].packed[0, 0].item()
            layers[k] = tuple(lst)
    lm = params.get("lm_head")
    if isinstance(lm, Q4Tensor) and _eligible(lm):
        params = dict(params, lm_head=to_plane_split(lm))
    return params


def param_bytes(params) -> int:
    import jax

    total = 0
    for leaf in jax.tree.leaves(params):
        total += leaf.size * leaf.dtype.itemsize
    return total


def fuse_qkv_params(cfg: ModelConfig, params: Dict[str, Any], *,
                    consume: bool = False) -> Dict[str, Any]:
    """Fuse per-layer wq/wk/wv (+bq/bk/bv) into one head-interleaved
    ``w_qkv`` [L, K/2, 3E] (+``b_qkv`` [L, 3E]).

    One fused matmul replaces three per layer on the decode hot path: each
    Pallas dispatch costs ~15 us of launch + activation-deinterleave overhead
    (tools/microbench_q4.py), so 28 layers x 2 saved dispatches ~= 0.8 ms of
    a ~12 ms GPT-J-6B step.  The reference keeps q/k/v separate because its
    converter split them (convert_gptneox_to_ggml.py:109-183); checkpoints
    and converters here stay in the split layout — this is a load-time
    device-side transform (InferenceEngine applies it when cfg.fuse_qkv).

    Column order per head h: [q_h | k_h | v_h], so tensor-parallel sharding
    over the output axis still splits on head boundaries and attention
    recovers q/k/v with one reshape [B,T,H,3,D] (no cross-shard gather).
    """
    # consume=True mutates the INPUT's layers dict so the split q/k/v free
    # as the fused copies build (a 20B model cannot hold both sets plus the
    # caller's pinned reference; see prepare_unrolled_params)
    layers = params["layers"] if consume else dict(params["layers"])
    if "w_qkv" in layers or "wq" not in layers:
        return params
    H, D = cfg.n_head, cfg.head_dim
    wq, wk, wv = (layers.pop(k) for k in ("wq", "wk", "wv"))

    def mix_last(a, b, c):
        """Interleave the E-sized last axis of three arrays into 3E."""
        lead = a.shape[:-1]
        stk = jnp.stack(
            [x.reshape(*lead, H, D) for x in (a, b, c)], axis=-2
        )  # [..., H, 3, D]
        return stk.reshape(*lead, 3 * H * D)

    if isinstance(wq, tuple):  # already-unstacked per-layer weights
        wq, wk, wv = list(wq), list(wk), list(wv)
        fused = []
        for i in range(len(wq)):
            q, k, v = wq[i], wk[i], wv[i]
            fused.append(Q4Tensor(
                packed=mix_last(q.packed, k.packed, v.packed),
                scales=mix_last(q.scales, k.scales, v.scales)))
            if consume:  # release the split layer + hard-sync the pipeline
                wq[i] = wk[i] = wv[i] = q = k = v = None
                fused[-1].packed[0, 0].item()
        layers["w_qkv"] = tuple(fused)
        if all(k in layers for k in ("bq", "bk", "bv")):
            layers["b_qkv"] = mix_last(
                *(layers.pop(k) for k in ("bq", "bk", "bv")))
        return dict(params, layers=layers)

    if isinstance(wq, Q4Tensor):
        layers["w_qkv"] = Q4Tensor(
            packed=mix_last(wq.packed, wk.packed, wv.packed),
            scales=mix_last(wq.scales, wk.scales, wv.scales),
        )
    else:
        # dense stacked [L, O, K]: interleave the output axis
        stk = jnp.stack(
            [x.reshape(x.shape[0], H, D, x.shape[-1]) for x in (wq, wk, wv)],
            axis=2,
        )  # [L, H, 3, D, K]
        layers["w_qkv"] = stk.reshape(wq.shape[0], 3 * H * D, wq.shape[-1])
    if all(k in layers for k in ("bq", "bk", "bv")):
        layers["b_qkv"] = mix_last(
            *(layers.pop(k) for k in ("bq", "bk", "bv")))
    return dict(params, layers=layers)
