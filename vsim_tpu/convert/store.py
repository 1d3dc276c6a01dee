"""Native checkpoint store: params pytree ↔ directory of .npy leaves.

The framework's own persistence format (fast, mmap-able, no pickles):
a manifest.json describing the config + tree structure, one .npy per leaf.
The reference's only persistent artifacts are ggml model files
(SURVEY.md §5 checkpoint/resume row); this is their vsim_tpu-native
counterpart, with ggml import/export living in convert/ggml_file.py.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.quant.q4 import Q4Tensor

_FORMAT_VERSION = 1


def _flatten(tree: Any, prefix: str = "") -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    if isinstance(tree, Q4Tensor):
        out[prefix + ".q4packed"] = tree.packed
        out[prefix + ".q4scales"] = tree.scales
    elif isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}/{k}" if prefix else k))
    else:
        out[prefix] = tree
    return out


def save_params(path: str, cfg: ModelConfig, params: Any) -> None:
    os.makedirs(path, exist_ok=True)
    leaves = _flatten(params)
    # .npy cannot represent ml_dtypes (bfloat16 round-trips as void "|V2"),
    # so record each leaf's true dtype and re-view on load.
    dtypes = {name: str(np.asarray(a).dtype) for name, a in leaves.items()}
    manifest = {
        "format_version": _FORMAT_VERSION,
        "config": dataclasses.asdict(cfg),
        "leaves": sorted(leaves),
        "dtypes": dtypes,
    }
    for name, arr in leaves.items():
        fn = os.path.join(path, name.replace("/", "__") + ".npy")
        np.save(fn, np.asarray(arr))
    with open(os.path.join(path, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)


def load_params(path: str, mmap: bool = False) -> Tuple[ModelConfig, Any]:
    with open(os.path.join(path, "manifest.json")) as f:
        manifest = json.load(f)
    cfg = ModelConfig(**manifest["config"])
    dtypes = manifest.get("dtypes", {})
    flat: Dict[str, Any] = {}
    for name in manifest["leaves"]:
        fn = os.path.join(path, name.replace("/", "__") + ".npy")
        arr = np.load(fn, mmap_mode="r" if mmap else None)
        want = dtypes.get(name)
        if want and str(arr.dtype) != want:
            import ml_dtypes  # restore bfloat16 & friends from the raw bytes

            arr = arr.view(np.dtype(want))
        flat[name] = arr

    # unflatten: group q4 pairs, rebuild nested dicts
    tree: Dict[str, Any] = {}

    def insert(keypath: str, value):
        parts = keypath.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    handled = set()
    for name in list(flat):
        if name.endswith(".q4packed"):
            base = name[: -len(".q4packed")]
            insert(base, Q4Tensor(
                packed=jnp.asarray(flat[name]),
                scales=jnp.asarray(flat[base + ".q4scales"]),
            ))
            handled.add(name)
            handled.add(base + ".q4scales")
    for name, arr in flat.items():
        if name not in handled:
            insert(name, jnp.asarray(arr))
    return cfg, tree
