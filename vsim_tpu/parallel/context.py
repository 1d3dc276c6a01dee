"""Logical-axis sharding context.

The model code annotates activations with *logical* axis names ("batch",
"heads", "embed", ...).  When a mesh context is active, those names map to
mesh axes and become ``with_sharding_constraint`` hints for the GSPMD
partitioner; with no context they are no-ops, so single-chip code paths pay
nothing.  This replaces the reference's NLANE/NCHIP lane plumbing
(imax.c:41-71, emax7.h:43-46) with declarative mesh sharding.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Dict, Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# default logical-name → mesh-axis mapping (Megatron-style 2-D mesh)
DEFAULT_RULES: Dict[str, str] = {
    "batch": "data",
    "heads": "model",
    "vocab": "model",
    "ffn": "model",
    "embed": None,  # replicated
    # sequence parallelism (Megatron-SP): map "seq" -> "model" via
    # use_mesh(..., rules={"seq": "model"}) to shard the residual stream's
    # token axis through LN/residual segments (prefill/training only —
    # decode has T=1).  Off by default.
    "seq": None,
}


class _State(threading.local):
    def __init__(self):
        self.mesh: Optional[Mesh] = None
        self.rules: Dict[str, Optional[str]] = dict(DEFAULT_RULES)


_STATE = _State()


@contextlib.contextmanager
def use_mesh(mesh: Optional[Mesh], rules: Optional[Dict[str, str]] = None):
    """Activate a mesh (and optional rule overrides) for model tracing."""
    prev = (_STATE.mesh, _STATE.rules)
    _STATE.mesh = mesh
    if rules is not None:
        _STATE.rules = {**DEFAULT_RULES, **rules}
    try:
        yield
    finally:
        _STATE.mesh, _STATE.rules = prev


def current_mesh() -> Optional[Mesh]:
    return _STATE.mesh


def logical_spec(*names: Optional[str]) -> P:
    """Map logical axis names to a PartitionSpec under the current rules."""
    axes = []
    for n in names:
        a = _STATE.rules.get(n) if n is not None else None
        axes.append(a)
    return P(*axes)


def constrain(x: jax.Array, *names: Optional[str]) -> jax.Array:
    """with_sharding_constraint by logical names; no-op without a mesh."""
    mesh = _STATE.mesh
    if mesh is None:
        return x
    spec = logical_spec(*names)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))
