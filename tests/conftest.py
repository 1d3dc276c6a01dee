"""Test config: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's `.emax7nc` software-emulation strategy (SURVEY.md §4.3):
the exact accelerator code paths run functionally on CPU; real-TPU perf is
measured separately by bench.py.

Note: this container's sitecustomize registers the axon TPU tunnel and calls
``jax.config.update("jax_platforms", "axon,cpu")``, which overrides the
JAX_PLATFORMS env var — so we must force CPU via config.update *after* the
jax import.  The tunnel is also single-client: tests must never claim it, or
they serialize against (and hang behind) any running benchmark.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
# keep any python subprocesses spawned by tests off the TPU tunnel too
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
