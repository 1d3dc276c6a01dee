"""Pipeline parallelism: GPipe-style layer-stage pipelining over a mesh axis.

The reference's only pipelining is the EMAX lane macro-pipeline — NLANE=2
per-lane arenas with a sigwait handshake between cpyin/exec/cpyout phases
(imax.c:41-71, emax7lib.c:768-779, SURVEY.md §2.3).  The TPU-native
generalization: layers are split into S contiguous stages, one per device
along a ``pipe`` mesh axis; microbatches stream through the stages with
activations rotating stage-to-stage via ``ppermute`` over ICI.  Every device
runs the same SPMD program (shard_map); the schedule is the classic GPipe
fill-steady-drain loop with S-1 bubble steps.

Intended use: training / whole-sequence eval of models too deep for one
chip's HBM.  Decode serving uses tensor parallelism instead (sharding.py) —
PP bubbles are hostile to latency-bound decode.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import inspect

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

# jax renamed check_rep -> check_vma in the stable API
_CHECK_KW = ("check_vma" if "check_vma"
             in inspect.signature(_shard_map).parameters else "check_rep")


def shard_map(f=None, **kw):
    if "check_rep" in kw:
        kw[_CHECK_KW] = kw.pop("check_rep")
    if f is None:
        return lambda g: _shard_map(g, **kw)
    return _shard_map(f, **kw)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.transformer import decoder_layer, embed, alibi_slopes
from vsim_tpu.ops.layers import layer_norm
from vsim_tpu.ops.matmul import q4_matmul

AXIS_PIPE = "pipe"


def stage_params(params: Dict[str, Any], n_stages: int, mesh: Mesh):
    """Reshape stacked layer params [L, ...] → [S, L/S, ...] and shard the
    stage dim over the pipe axis; embed/head params replicate."""
    L = None

    def reshape_leaf(x):
        nonlocal L
        L = x.shape[0]
        assert L % n_stages == 0, f"n_layer {L} % n_stages {n_stages} != 0"
        return x.reshape(n_stages, L // n_stages, *x.shape[1:])

    layers = jax.tree.map(reshape_leaf, params["layers"])
    staged = dict(params, layers=layers)

    def shard_leaf(path, x):
        is_layer = path[0].key == "layers"
        spec = P(AXIS_PIPE) if is_layer else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(shard_leaf, staged)


def pipeline_forward_nocache(
    cfg: ModelConfig,
    staged_params: Dict[str, Any],
    token_ids: jnp.ndarray,  # [M, mB, T] microbatches
    mesh: Mesh,
) -> jnp.ndarray:
    """Cache-free forward over microbatches, layer stages pipelined on the
    ``pipe`` mesh axis.  Returns logits [M, mB, T, V].

    Schedule: for t in range(M + S - 1): every stage applies its layers to
    the activation it holds, then rotates it to the next stage.  Stage 0
    feeds microbatch t in; stage S-1 banks its output at t >= S-1.
    """
    S = mesh.shape[AXIS_PIPE]
    M, mB, T = token_ids.shape
    cdt = jnp.dtype(cfg.compute_dtype)
    n_past = jnp.int32(0)
    positions = jnp.broadcast_to(
        jnp.arange(T, dtype=jnp.int32)[None, :], (mB, T))
    slopes = alibi_slopes(cfg.n_head) if cfg.alibi else None
    per_stage = cfg.n_layer // S

    # embed all microbatches (replicated — tiny vs layer compute)
    x_all = jax.vmap(lambda ids: embed(cfg, staged_params, ids, cdt))(token_ids)

    layers_staged = staged_params["layers"]

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(AXIS_PIPE), P()),
        out_specs=P(),
        check_rep=False,
    )
    def run_stages(stage_layers, xs):
        # stage_layers: local [1, per_stage, ...]; xs: [M, mB, T, E]
        stage = jax.lax.axis_index(AXIS_PIPE)
        perm = [(i, (i + 1) % S) for i in range(S)]

        def apply_stage(x):
            def body(h, lp):
                h, _, _, _ = decoder_layer(
                    cfg, lp, h, None, None, jnp.int32(0), positions, n_past,
                    slopes)
                return h, None

            local = jax.tree.map(lambda a: a[0], stage_layers)
            h, _ = jax.lax.scan(body, x, local, length=per_stage)
            return h

        buf = jnp.zeros_like(xs[0])
        outs = jnp.zeros_like(xs)

        def step(t, carry):
            buf, outs = carry
            # stage 0 ingests microbatch t (clamped; garbage beyond M is
            # masked by the banking condition below)
            feed = jax.lax.dynamic_index_in_dim(
                xs, jnp.clip(t, 0, M - 1), 0, keepdims=False)
            x_in = jnp.where(stage == 0, feed, buf)
            y = apply_stage(x_in)
            # last stage banks microbatch t-(S-1) once the pipe is full
            bank = jnp.logical_and(stage == S - 1, t >= S - 1)
            idx = jnp.clip(t - (S - 1), 0, M - 1)
            prev = jax.lax.dynamic_index_in_dim(outs, idx, 0, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(bank, y, prev), idx, 0)
            buf = jax.lax.ppermute(y, AXIS_PIPE, perm)
            return buf, outs

        buf, outs = jax.lax.fori_loop(0, M + S - 1, step, (buf, outs))
        # only stage S-1 holds real outputs; broadcast them to all stages
        outs = jnp.where(stage == S - 1, outs, jnp.zeros_like(outs))
        return jax.lax.psum(outs, AXIS_PIPE)

    x_out = run_stages(layers_staged, x_all)

    def head(x):
        x = layer_norm(x, staged_params["ln_f_w"], staged_params["ln_f_b"],
                       cfg.ln_eps)
        logits = q4_matmul(x, staged_params["lm_head"], compute_dtype=cdt)
        if logits.shape[-1] != cfg.n_vocab:
            logits = logits[..., : cfg.n_vocab]
        if "lm_head_b" in staged_params:
            logits = logits + staged_params["lm_head_b"].astype(logits.dtype)
        return logits.astype(jnp.float32)

    return jax.vmap(head)(x_out)
