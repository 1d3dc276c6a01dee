"""Reference ggml binary model-file interop (read AND write).

File layout (gptneox_model_load, vsim.cpp:108-458; converters/convert_*.py):
  magic 0x67676d6c ('ggml'),
  per-arch int32 hparams (NO n_ctx — the reference forces 512 at load,
  vsim.cpp:758),
  vocab: n_vocab × {uint32 len, bytes}   (gptj/gpt2 prefix an explicit count,
  convert_gptj:126 / convert_gpt2:87),
  tensor records until EOF: {int32 n_dims, name_len, ftype,
  ne[n_dims] (minor-first: ne[0]=K), name bytes, raw data}.
  ftype: 0=f32, 1=f16, 2=q4_0 (20-byte blocks), 3=q4_1.

This lets the new framework load the exact int4_fixed_zero.bin artifacts the
reference publishes, and lets our quantizer emit files the reference binary
can run — full wire-format compatibility in both directions.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.quant.q4 import (
    DEFAULT_SCALE_DTYPE,
    GGML_BLOCK_BYTES,
    QK,
    Q4Tensor,
    from_ggml_q4_0_bytes,
)

MAGIC = 0x67676D6C

FTYPE_F32, FTYPE_F16, FTYPE_Q4_0, FTYPE_Q4_1 = 0, 1, 2, 3

# int32 hparams after magic, per arch (see module docstring for cites)
_HEADER_FIELDS = {
    "gptneox": ["n_vocab", "n_embd", "n_head", "n_layer", "n_rot",
                "use_parallel_residual", "ftype"],
    "gptj": ["n_vocab", "n_embd", "n_head", "n_layer", "n_rot", "ftype"],
    "bloom": ["n_vocab", "n_embd", "multiple_of", "n_head", "n_layer", "ftype"],
    "gpt2": ["n_vocab", "n_embd", "n_head", "n_layer", "n_rot", "ftype"],
}
# archs whose vocab section is prefixed with its own count
_VOCAB_COUNT_PREFIX = {"gptj", "gpt2"}


class GGMLTensor:
    __slots__ = ("name", "shape", "ftype", "raw")

    def __init__(self, name: str, shape: Tuple[int, ...], ftype: int,
                 raw: np.ndarray):
        self.name = name
        self.shape = shape  # logical numpy order (rows, cols) = (O, K)
        self.ftype = ftype
        self.raw = raw  # uint8 buffer

    def to_numpy(self) -> np.ndarray:
        """Dense f32 view of the tensor."""
        if self.ftype == FTYPE_F32:
            return self.raw.view(np.float32).reshape(self.shape)
        if self.ftype == FTYPE_F16:
            from vsim_tpu import native

            return native.f16_to_f32(
                self.raw.view(np.float16)).reshape(self.shape)
        if self.ftype == FTYPE_Q4_0:
            from vsim_tpu.quant.q4 import dequantize_q4_0_np

            O, K = self.shape
            packed, scales = from_ggml_q4_0_bytes(self.raw, O, K, np.float32)
            return dequantize_q4_0_np(packed, scales)
        if self.ftype == FTYPE_Q4_1:
            from vsim_tpu.quant.q4 import (
                dequantize_q4_1_np,
                from_ggml_q4_1_bytes,
            )

            O, K = self.shape
            packed, deltas, mins = from_ggml_q4_1_bytes(self.raw, O, K)
            return dequantize_q4_1_np(packed, deltas, mins)
        raise NotImplementedError(f"ftype {self.ftype} ({self.name})")

    def to_weight(self, scale_dtype=DEFAULT_SCALE_DTYPE):
        """Q4Tensor for q4_0 payloads (zero-requantization), dense otherwise."""
        import jax.numpy as jnp

        if self.ftype == FTYPE_Q4_0 and len(self.shape) == 2:
            from vsim_tpu import native

            O, K = self.shape
            # single-pass multithreaded C++ repack to K-major (numpy fallback
            # inside) — the hot transform for multi-GB model loads
            packed_km, scales_km = native.ggml_to_kmajor(
                self.raw, O, K, scale_dtype=scale_dtype)
            return Q4Tensor(packed=jnp.asarray(packed_km),
                            scales=jnp.asarray(scales_km))
        return jnp.asarray(self.to_numpy())


def read_ggml(path: str, arch: str):
    """→ (hparams dict, vocab list[bytes], dict name → GGMLTensor)."""
    fields = _HEADER_FIELDS[arch]
    with open(path, "rb") as f:
        (magic,) = struct.unpack("<i", f.read(4))
        if magic != MAGIC:
            raise ValueError(f"{path}: bad magic {magic:#x} (want {MAGIC:#x})")
        hparams = dict(zip(fields, struct.unpack(f"<{len(fields)}i",
                                                 f.read(4 * len(fields)))))
        n_vocab = hparams["n_vocab"]
        if arch in _VOCAB_COUNT_PREFIX:
            (n_tok,) = struct.unpack("<i", f.read(4))
        else:
            n_tok = n_vocab
        vocab: List[bytes] = []
        for _ in range(n_tok):
            (ln,) = struct.unpack("<I", f.read(4))
            vocab.append(f.read(ln))
        tensors: Dict[str, GGMLTensor] = {}
        while True:
            head = f.read(12)
            if len(head) < 12:
                break
            n_dims, name_len, ftype = struct.unpack("<3i", head)
            ne = struct.unpack(f"<{n_dims}i", f.read(4 * n_dims))  # minor-first
            name = f.read(name_len).decode("utf-8", errors="replace")
            shape = tuple(reversed(ne))  # numpy order
            nelem = int(np.prod(ne))
            if ftype == FTYPE_F32:
                nbytes = nelem * 4
            elif ftype == FTYPE_F16:
                nbytes = nelem * 2
            elif ftype == FTYPE_Q4_0:
                nbytes = nelem // QK * GGML_BLOCK_BYTES
            elif ftype == FTYPE_Q4_1:
                nbytes = nelem // QK * (8 + QK // 2)
            else:
                raise ValueError(f"{path}: unknown ftype {ftype} for {name!r}")
            raw = np.frombuffer(f.read(nbytes), dtype=np.uint8)
            tensors[name] = GGMLTensor(name, shape, ftype, raw)
    return hparams, vocab, tensors


def write_ggml(path: str, arch: str, hparams: Dict[str, int],
               vocab: List[bytes], tensors: List[GGMLTensor]) -> None:
    """Emit a reference-loadable ggml file."""
    fields = _HEADER_FIELDS[arch]
    with open(path, "wb") as f:
        f.write(struct.pack("<i", MAGIC))
        f.write(struct.pack(f"<{len(fields)}i", *(hparams[k] for k in fields)))
        if arch in _VOCAB_COUNT_PREFIX:
            f.write(struct.pack("<i", len(vocab)))
        for tok in vocab:
            f.write(struct.pack("<I", len(tok)))
            f.write(tok)
        for t in tensors:
            ne = tuple(reversed(t.shape))
            name_b = t.name.encode("utf-8")
            f.write(struct.pack("<3i", len(ne), len(name_b), t.ftype))
            f.write(struct.pack(f"<{len(ne)}i", *ne))
            f.write(name_b)
            f.write(np.ascontiguousarray(t.raw).tobytes())


def hparams_to_config(arch: str, hparams: Dict[str, int],
                      n_ctx: int = 512) -> ModelConfig:
    """ggml header → ModelConfig (n_ctx defaults to the reference's forced
    512, vsim.cpp:758; n_ff follows each arch's convention)."""
    E = hparams["n_embd"]
    common = dict(
        n_vocab=hparams["n_vocab"], n_ctx=n_ctx, n_embd=E,
        n_head=hparams["n_head"], n_layer=hparams["n_layer"],
    )
    if arch == "gptneox":
        return ModelConfig(
            arch="gptneox", n_ff=4 * E, n_rot=hparams["n_rot"],
            parallel_residual=bool(hparams.get("use_parallel_residual", 1)),
            activation="gelu_tanh", **common,
        )
    if arch == "gptj":
        return ModelConfig(
            arch="gptj", n_ff=4 * E, n_rot=hparams["n_rot"],
            rotary_interleaved=True, parallel_residual=True,
            shared_layernorm=True, qkv_bias=False, attn_out_bias=False,
            final_logit_bias=True, activation="gelu_tanh", **common,
        )
    if arch == "bloom":
        mult = hparams.get("multiple_of", 1) or 1
        n_ff = ((4 * E + mult - 1) // mult) * mult
        return ModelConfig(
            arch="bloom", n_ff=n_ff, parallel_residual=False, alibi=True,
            activation="gelu_tanh", **common,
        )
    if arch == "gpt2":
        return ModelConfig(
            arch="gpt2", n_ff=4 * E, parallel_residual=False,
            learned_pos=True, activation="gelu_tanh", **common,
        )
    raise ValueError(arch)


# name of each param slot in a ggml file, per arch ({i} = layer index).
# gptneox names: vsim.cpp:276-346 tensor map.
_GGML_NAME_MAPS = {
    "gptneox": {
        "wte": "gpt_neox.embed_in.weight",
        "ln_f_w": "gpt_neox.final_layer_norm.weight",
        "ln_f_b": "gpt_neox.final_layer_norm.bias",
        "lm_head": "embed_out.weight",
        "ln1_w": "gpt_neox.layers.{i}.input_layernorm.weight",
        "ln1_b": "gpt_neox.layers.{i}.input_layernorm.bias",
        "ln2_w": "gpt_neox.layers.{i}.post_attention_layernorm.weight",
        "ln2_b": "gpt_neox.layers.{i}.post_attention_layernorm.bias",
        "wq": "gpt_neox.layers.{i}.attention.query.weight",
        "bq": "gpt_neox.layers.{i}.attention.query.bias",
        "wk": "gpt_neox.layers.{i}.attention.key.weight",
        "bk": "gpt_neox.layers.{i}.attention.key.bias",
        "wv": "gpt_neox.layers.{i}.attention.value.weight",
        "bv": "gpt_neox.layers.{i}.attention.value.bias",
        "wo": "gpt_neox.layers.{i}.attention.dense.weight",
        "bo": "gpt_neox.layers.{i}.attention.dense.bias",
        "w_fc": "gpt_neox.layers.{i}.mlp.dense_h_to_4h.weight",
        "b_fc": "gpt_neox.layers.{i}.mlp.dense_h_to_4h.bias",
        "w_proj": "gpt_neox.layers.{i}.mlp.dense_4h_to_h.weight",
        "b_proj": "gpt_neox.layers.{i}.mlp.dense_4h_to_h.bias",
    },
    "gptj": {
        "wte": "transformer.wte.weight",
        "ln_f_w": "transformer.ln_f.weight",
        "ln_f_b": "transformer.ln_f.bias",
        "lm_head": "lm_head.weight",
        "lm_head_b": "lm_head.bias",
        "ln1_w": "transformer.h.{i}.ln_1.weight",
        "ln1_b": "transformer.h.{i}.ln_1.bias",
        "wq": "transformer.h.{i}.attn.q_proj.weight",
        "wk": "transformer.h.{i}.attn.k_proj.weight",
        "wv": "transformer.h.{i}.attn.v_proj.weight",
        "wo": "transformer.h.{i}.attn.out_proj.weight",
        "w_fc": "transformer.h.{i}.mlp.fc_in.weight",
        "b_fc": "transformer.h.{i}.mlp.fc_in.bias",
        "w_proj": "transformer.h.{i}.mlp.fc_out.weight",
        "b_proj": "transformer.h.{i}.mlp.fc_out.bias",
    },
    # bloom files use llama-style names; the fused qkv is re-grouped to
    # [all-q; all-k; all-v] rows by the reference converter
    # (convert_bloom_to_ggml.py:22-33, 125-127)
    "bloom": {
        "wte": "tok_embeddings.weight",
        "emb_ln_w": "norm.weight",
        "emb_ln_b": "norm.bias",
        "ln_f_w": "output_norm.weight",
        "ln_f_b": "output_norm.bias",
        "lm_head": "output.weight",
        "ln1_w": "layers.{i}.attention_norm.weight",
        "ln1_b": "layers.{i}.attention_norm.bias",
        "ln2_w": "layers.{i}.ffn_norm.weight",
        "ln2_b": "layers.{i}.ffn_norm.bias",
        "w_qkv": "layers.{i}.attention.query_key_value.weight",
        "b_qkv": "layers.{i}.attention.query_key_value.bias",
        "wo": "layers.{i}.attention.wo.weight",
        "bo": "layers.{i}.attention.wo.bias",
        "w_fc": "layers.{i}.feed_forward.w1.weight",
        "b_fc": "layers.{i}.feed_forward.w1.bias",
        "w_proj": "layers.{i}.feed_forward.w2.weight",
        "b_proj": "layers.{i}.feed_forward.w2.bias",
    },
    # gpt2 files are written by convert_gpt2_to_ggml.py from an AutoModel
    # (base GPT2Model) state_dict — HF names WITHOUT the "transformer."
    # prefix, Conv1D [in, out] orientation kept as-is, and every 2-D
    # ".*weight" quantized along the minor (out) axis (quantize_gpt2.cpp:170).
    "gpt2": {
        "wte": "wte.weight",
        "wpe": "wpe.weight",
        "ln_f_w": "ln_f.weight",
        "ln_f_b": "ln_f.bias",
        "ln1_w": "h.{i}.ln_1.weight",
        "ln1_b": "h.{i}.ln_1.bias",
        "ln2_w": "h.{i}.ln_2.weight",
        "ln2_b": "h.{i}.ln_2.bias",
        "w_attn": "h.{i}.attn.c_attn.weight",  # fused qkv [E, 3E] conv1d
        "b_attn": "h.{i}.attn.c_attn.bias",
        "wo": "h.{i}.attn.c_proj.weight",
        "bo": "h.{i}.attn.c_proj.bias",
        "w_fc": "h.{i}.mlp.c_fc.weight",
        "b_fc": "h.{i}.mlp.c_fc.bias",
        "w_proj": "h.{i}.mlp.c_proj.weight",
        "b_proj": "h.{i}.mlp.c_proj.bias",
    },
}


def load_ggml_model(path: str, arch: str, *, n_ctx: int = 512,
                    scale_dtype=DEFAULT_SCALE_DTYPE):
    """Reference ggml file → (ModelConfig, params pytree, vocab).

    Q4_0 tensors are re-wrapped without requantization (bit-identical
    nibbles; scales cast from f32 to ``scale_dtype``).
    """
    import jax.numpy as jnp

    hparams, vocab, tensors = read_ggml(path, arch)
    cfg = hparams_to_config(arch, hparams, n_ctx=n_ctx)
    names = _GGML_NAME_MAPS[arch]

    def get(slot: str, i: Optional[int] = None) -> GGMLTensor:
        name = names[slot].format(i=i)
        if name not in tensors:
            raise KeyError(f"{path}: missing tensor {name!r}")
        return tensors[name]

    def w(slot, i=None):
        return get(slot, i).to_weight(scale_dtype)

    def vec(slot, i=None):
        return jnp.asarray(get(slot, i).to_numpy())

    E = cfg.n_embd
    params: Dict[str, Any] = {}
    zeros_e = np.zeros((E,), np.float32)

    layer_list = []
    for i in range(cfg.n_layer):
        if arch == "gpt2":
            wa = get("w_attn", i).to_numpy().reshape(E, 3 * E).T  # → [3E, E]
            ba = get("b_attn", i).to_numpy().reshape(3 * E)
            lp = {
                "ln1_w": get("ln1_w", i).to_numpy().reshape(E),
                "ln1_b": get("ln1_b", i).to_numpy().reshape(E),
                "ln2_w": get("ln2_w", i).to_numpy().reshape(E),
                "ln2_b": get("ln2_b", i).to_numpy().reshape(E),
                "wq": wa[:E], "bq": ba[:E],
                "wk": wa[E:2 * E], "bk": ba[E:2 * E],
                "wv": wa[2 * E:], "bv": ba[2 * E:],
                "wo": get("wo", i).to_numpy().reshape(E, E).T,
                "bo": get("bo", i).to_numpy().reshape(E),
                "w_fc": get("w_fc", i).to_numpy().reshape(E, cfg.n_ff).T,
                "b_fc": get("b_fc", i).to_numpy().reshape(cfg.n_ff),
                "w_proj": get("w_proj", i).to_numpy().reshape(cfg.n_ff, E).T,
                "b_proj": get("b_proj", i).to_numpy().reshape(E),
            }
        elif arch == "bloom":
            # fused grouped qkv → split rows [q; k; v] each [E, E]
            wqkv = get("w_qkv", i).to_numpy().reshape(3 * E, E)
            bqkv = get("b_qkv", i).to_numpy().reshape(3 * E)
            mk = lambda m: Q4Tensor.from_dense_np(m, scale_dtype)
            lp = {
                "ln1_w": vec("ln1_w", i), "ln1_b": vec("ln1_b", i),
                "ln2_w": vec("ln2_w", i), "ln2_b": vec("ln2_b", i),
                "wq": mk(wqkv[:E]), "bq": bqkv[:E],
                "wk": mk(wqkv[E:2 * E]), "bk": bqkv[E:2 * E],
                "wv": mk(wqkv[2 * E:]), "bv": bqkv[2 * E:],
                "wo": w("wo", i), "bo": vec("bo", i),
                "w_fc": w("w_fc", i), "b_fc": vec("b_fc", i),
                "w_proj": w("w_proj", i), "b_proj": vec("b_proj", i),
            }
        else:
            lp = {
                "ln1_w": vec("ln1_w", i), "ln1_b": vec("ln1_b", i),
                "wq": w("wq", i), "wk": w("wk", i), "wv": w("wv", i),
                "wo": w("wo", i),
                "w_fc": w("w_fc", i), "b_fc": vec("b_fc", i),
                "w_proj": w("w_proj", i), "b_proj": vec("b_proj", i),
            }
            if arch == "gptj":
                lp.update({
                    "ln2_w": np.ones((E,), np.float32), "ln2_b": zeros_e,
                    "bq": zeros_e, "bk": zeros_e, "bv": zeros_e, "bo": zeros_e,
                })
            else:
                lp.update({
                    "ln2_w": vec("ln2_w", i), "ln2_b": vec("ln2_b", i),
                    "bq": vec("bq", i), "bk": vec("bk", i),
                    "bv": vec("bv", i), "bo": vec("bo", i),
                })
        layer_list.append(lp)

    # stack layers
    def stack(*ls):
        if isinstance(ls[0], Q4Tensor):
            return Q4Tensor(
                packed=jnp.stack([l.packed for l in ls]),
                scales=jnp.stack([l.scales for l in ls]),
            )
        return jnp.stack([jnp.asarray(l, dtype=jnp.float32) for l in ls])

    params["layers"] = {
        k: stack(*[lp[k] for lp in layer_list]) for k in layer_list[0]
    }

    if arch == "gpt2":
        wte = get("wte").to_numpy()
        params["wte"] = Q4Tensor.from_dense_np(wte, scale_dtype)
        params["lm_head"] = params["wte"]
        params["wpe"] = jnp.asarray(get("wpe").to_numpy())
        params["ln_f_w"] = jnp.asarray(get("ln_f_w").to_numpy().reshape(E))
        params["ln_f_b"] = jnp.asarray(get("ln_f_b").to_numpy().reshape(E))
    else:
        params["wte"] = w("wte")
        params["ln_f_w"] = vec("ln_f_w")
        params["ln_f_b"] = vec("ln_f_b")
        if arch == "bloom":
            params["emb_ln_w"] = vec("emb_ln_w")
            params["emb_ln_b"] = vec("emb_ln_b")
            try:
                params["lm_head"] = w("lm_head")
            except KeyError:
                params["lm_head"] = params["wte"]  # tied
        else:
            params["lm_head"] = w("lm_head")
        if arch == "gptj":
            params["lm_head_b"] = vec("lm_head_b")
    return cfg, params, vocab
