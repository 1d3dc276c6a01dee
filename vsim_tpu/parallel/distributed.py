"""Multi-host runtime entry point.

The reference is strictly single-process (SURVEY.md §2.3: no MPI/NCCL —
its only "interconnect" is the host↔CGRA AXI DMA, emax7lib.c:780-910).
The TPU-native framework scales across hosts with `jax.distributed`: every
host runs the same program, the JAX runtime wires the hosts into one global
device set over DCN, and the existing mesh/pjit code paths work unchanged —
a Mesh built from ``jax.devices()`` (all hosts' devices) instead of the
local ones is the ONLY difference between single- and multi-host.

Usage (same program on every host):

    from vsim_tpu.parallel import distributed
    distributed.initialize()          # env- or arg-configured
    mesh = distributed.global_mesh((distributed.process_count(), -1))
    ...                                # pjit/shard_map as usual

Configuration, in priority order:
  1. explicit arguments,
  2. ``VSIM_COORDINATOR`` / ``VSIM_NUM_PROCESSES`` / ``VSIM_PROCESS_ID`` env
     vars (our flag-system tier, SURVEY.md §5 config rows),
  3. jax's own auto-detection (TPU pods / Cloud metadata), which needs no
     configuration at all on real multi-host TPU slices.

Tested by ``tests/test_distributed.py`` with 2 CPU processes × 4 virtual
devices on one machine (the SURVEY §4.6 multi-node test recipe).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax

from vsim_tpu.parallel.mesh import AXIS_DATA, AXIS_MODEL

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> None:
    """Join (or create) the multi-host runtime.  Idempotent; a no-op when
    no coordinator is configured anywhere (single-host mode)."""
    global _initialized
    if _initialized:
        return
    coordinator_address = coordinator_address or os.environ.get(
        "VSIM_COORDINATOR")
    if num_processes is None and "VSIM_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["VSIM_NUM_PROCESSES"])
    if process_id is None and "VSIM_PROCESS_ID" in os.environ:
        process_id = int(os.environ["VSIM_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # single-host (or jax auto-detected TPU pod): initialize only when
        # jax can figure the topology out itself on a real multi-host slice
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def process_count() -> int:
    return jax.process_count()


def process_index() -> int:
    return jax.process_index()


def global_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = (AXIS_DATA, AXIS_MODEL),
):
    """A mesh over the GLOBAL device set (all hosts).  ``shape`` may use -1
    for one dimension.  Default: data axis = hosts, model axis = per-host
    devices — DP over DCN, TP over ICI, the layout that keeps the chatty
    tensor-parallel collectives on the fast interconnect
    (BASELINE.md N>=2-hosts target)."""
    from vsim_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    n = len(devices)
    if shape is None:
        shape = (jax.process_count(), n // jax.process_count())
    else:
        shape = tuple(shape)
        if -1 in shape:
            known = 1
            for d in shape:
                if d != -1:
                    known *= d
            shape = tuple(n // known if d == -1 else d for d in shape)
    return make_mesh(shape, axis_names=axis_names, devices=devices)


def barrier(name: str = "vsim_barrier", timeout_s: int = 60) -> None:
    """Cross-host sync point (failure detection: a dead host trips the
    timeout instead of hanging the fleet forever)."""
    if not is_distributed():
        return
    client = jax._src.distributed.global_state.client
    if client is not None:
        client.wait_at_barrier(name, timeout_s * 1000)
