"""Device mesh construction for single- and multi-host runs.

The TPU-native replacement for the reference's accelerator topology constants
(EMAX_NLANE / EMAX_NCHIP, emax7.h:43-46): parallel capacity is a
``jax.sharding.Mesh`` with named axes, and all communication is XLA
collectives over ICI/DCN instead of AXI DMA (emax7lib.c:780-910).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

AXIS_DATA = "data"
AXIS_MODEL = "model"


def make_mesh(
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Sequence[str] = (AXIS_DATA, AXIS_MODEL),
    devices=None,
) -> Mesh:
    """Build a (data, model) mesh.  Default: all devices on the model axis
    (tensor parallel), which is the reference north-star layout for
    single-host GPT-J-6B serving (BASELINE.md)."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if shape is None:
        shape = (1, n)
    if shape[0] * shape[1] != n:
        raise ValueError(f"mesh shape {shape} != {n} devices")
    try:
        dev_array = mesh_utils.create_device_mesh(shape, devices=devices)
    except (ValueError, AssertionError):
        dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def single_device_mesh() -> Mesh:
    return make_mesh((1, 1), devices=jax.devices()[:1])
