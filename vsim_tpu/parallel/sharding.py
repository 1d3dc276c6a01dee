"""Parameter / KV-cache sharding rules (Megatron-style tensor parallelism).

Layout (SURVEY.md §2.3 "TP" row — the reference's NCHIP stubs reborn):
  * q/k/v and fc weights row-sharded over the ``model`` axis (attention heads
    and ffn neurons split across chips),
  * attention-out and mlp-proj weights col-sharded (contraction dim split;
    GSPMD inserts the reduce-scatter/all-reduce),
  * embeddings and lm_head vocab-sharded,
  * layernorms/biases-of-reduced-matmuls replicated,
  * KV cache head-sharded over ``model``, batch-sharded over ``data``.

Q4Tensor leaves shard congruently: ``packed`` [.., K/2, O] and ``scales``
[.., K/32, O] (K-major storage) carry the same PartitionSpec — a K-split
lands on the sublane axis and never cuts a Q4 block in half because every
per-device K extent stays a multiple of QK.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsim_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL
from vsim_tpu.quant.q4 import Q4Tensor

# weight-name → which logical dim is sharded
_ROW_PARALLEL = {"wq", "wk", "wv", "w_qkv", "w_fc"}  # shard O (output rows)
_COL_PARALLEL = {"wo", "w_proj"}  # shard K (contraction)
_ROW_BIAS = {"bq", "bk", "bv", "b_qkv", "b_fc"}
_VOCAB = {"wte", "lm_head"}


def _weight_spec(name: str, stacked: bool, k_major: bool) -> P:
    """Spec for a weight.  K-major (Q4Tensor) storage is [.., K', O]; dense
    storage is the logical [.., O, K]."""
    lead = (None,) if stacked else ()
    if name in _ROW_PARALLEL:  # shard O
        return P(*lead, None, AXIS_MODEL) if k_major else P(*lead, AXIS_MODEL, None)
    if name in _COL_PARALLEL:  # shard K
        return P(*lead, AXIS_MODEL, None) if k_major else P(*lead, None, AXIS_MODEL)
    if name in _VOCAB:  # shard vocab (= O)
        return P(None, AXIS_MODEL) if k_major else P(AXIS_MODEL, None)
    return P()


def _vec_spec(name: str, stacked: bool) -> P:
    lead = (None,) if stacked else ()
    if name in _ROW_BIAS:
        return P(*lead, AXIS_MODEL)
    if name == "lm_head_b":
        return P(AXIS_MODEL)
    return P()


def _divisible(shape, spec: P, mesh: Mesh) -> bool:
    for dim, axis in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if axis is None:
            continue
        if dim % mesh.shape[axis] != 0:
            return False
    return True


def param_pspecs(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Same-structure tree of PartitionSpec per array leaf.  Any leaf whose
    shape doesn't divide the mesh axis degrades to replicated."""

    def spec_leaf(name: str, leaf, stacked: bool):
        if isinstance(leaf, Q4Tensor):
            s = _weight_spec(name, stacked, k_major=True)
            sp = s if _divisible(leaf.packed.shape, s, mesh) else P()
            ss = s if _divisible(leaf.scales.shape, s, mesh) else P()
            return Q4Tensor(packed=sp, scales=ss)
        if leaf.ndim >= 2 and name in (_ROW_PARALLEL | _COL_PARALLEL | _VOCAB):
            s = _weight_spec(name, stacked, k_major=False)
        else:
            s = _vec_spec(name, stacked)
        return s if _divisible(leaf.shape, s, mesh) else P()

    out: Dict[str, Any] = {}
    for k, v in params.items():
        if k == "layers":
            out[k] = {lk: spec_leaf(lk, lv, stacked=True) for lk, lv in v.items()}
        else:
            out[k] = spec_leaf(k, v, stacked=False)
    return out


def cache_pspec(mesh: Mesh, cache=None) -> Dict[str, Any]:
    """KV cache [L, B, H, S, D] (head-major): batch over data, heads over
    model.

    For an int8 cache (models/transformer.py:init_cache), each side is a
    ``(values, scales [L,B,H,S])`` pair — scales shard congruently."""
    s5 = P(None, AXIS_DATA, AXIS_MODEL, None, None)
    if cache is not None and isinstance(cache.get("k"), tuple):
        s4 = P(None, AXIS_DATA, AXIS_MODEL, None)
        return {"k": (s5, s4), "v": (s5, s4)}
    return {"k": s5, "v": s5}


def _to_sharding_tree(spec_tree, mesh: Mesh):
    return jax.tree.map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )


def shard_params(params, mesh: Mesh):
    """Place a parameter pytree onto the mesh per the TP rules."""
    specs = param_pspecs(params, mesh)
    shardings = _to_sharding_tree(specs, mesh)
    return jax.device_put(params, shardings)


def shard_cache(cache, mesh: Mesh):
    specs = cache_pspec(mesh, cache)
    return jax.device_put(cache, _to_sharding_tree(specs, mesh))


def param_shardings(params, mesh: Mesh):
    return _to_sharding_tree(param_pspecs(params, mesh), mesh)


def cache_shardings(mesh: Mesh, cache=None):
    return _to_sharding_tree(cache_pspec(mesh, cache), mesh)
