"""Multi-host runtime: 2 CPU processes × 4 virtual devices each, wired by
``vsim_tpu.parallel.distributed`` into one 8-device global mesh, running a
psum and a tensor-parallel Q4 matmul across the process boundary.

This is the SURVEY §4.6 multi-node recipe (the reference has nothing to
mirror — no MPI/NCCL anywhere); it proves the `jax.distributed` entry point
end-to-end without real multi-host hardware.
"""

import os
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
import numpy as np

sys.path.insert(0, os.environ["VSIM_REPO"])

# the axon sitecustomize overrides JAX_PLATFORMS with jax.config — re-pin CPU
# the same way tests/conftest.py does, or the workers grab the TPU tunnel
import jax
jax.config.update("jax_platforms", "cpu")

from vsim_tpu.parallel import distributed

distributed.initialize()  # VSIM_* env vars configure the fleet
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = distributed.global_mesh((1, -1))  # all 8 devices tensor-parallel
assert mesh.devices.size == 8

# 1. cross-process collective: psum over the model axis
@jax.jit
def allsum(x):
    return jax.lax.psum(x, "model")

f = jax.shard_map(allsum, mesh=mesh, in_specs=P("model"), out_specs=P())
local = jnp.arange(8, dtype=jnp.float32)
arr = jax.device_put(local, NamedSharding(mesh, P("model")))
out = f(arr)
np.testing.assert_allclose(np.asarray(out)[0], 28.0)

# 2. tensor-parallel Q4 matmul: O-sharded weight, replicated x, identical
# logits to the single-device oracle
from vsim_tpu.quant.q4 import Q4Tensor, dequantize_km
from vsim_tpu.ops.matmul import q4_matmul

rng = np.random.default_rng(0)
O, K = 256, 128
wd = rng.standard_normal((O, K)).astype(np.float32)
w = Q4Tensor.from_dense_np(wd, scale_dtype=np.float32)
x = rng.standard_normal((4, K)).astype(np.float32)

ref = x @ np.asarray(dequantize_km(w, jnp.float32))

w_sh = Q4Tensor(
    packed=jax.device_put(w.packed, NamedSharding(mesh, P(None, "model"))),
    scales=jax.device_put(w.scales, NamedSharding(mesh, P(None, "model"))),
)
x_sh = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P()))
with mesh:
    got = jax.jit(lambda a, b: q4_matmul(a, b))(x_sh, w_sh)
from jax.experimental import multihost_utils
got_np = multihost_utils.process_allgather(got, tiled=True)
np.testing.assert_allclose(got_np, ref, rtol=2e-5, atol=2e-5)

distributed.barrier("done")
print(f"OK proc {jax.process_index()}")
"""


_SERVE_WORKER = r"""
import os, sys
import numpy as np

sys.path.insert(0, os.environ["VSIM_REPO"])

import jax
jax.config.update("jax_platforms", "cpu")

from vsim_tpu.parallel import distributed

distributed.initialize()
import jax.numpy as jnp

assert jax.process_count() == 2
assert len(jax.devices()) == 8

from vsim_tpu.engine.sampling import SamplingParams
from vsim_tpu.engine.serving import ServingEngine
from vsim_tpu.models.config import ModelConfig
from vsim_tpu.models.init import init_params

CFG = ModelConfig(
    arch="gptneox", n_vocab=256, n_ctx=128, n_embd=64, n_head=8,
    n_layer=2, n_ff=128, n_rot=8,
)
params = init_params(CFG, seed=0, quantize=True, scale_dtype=np.float32)

# single-process oracle FIRST (params are consumed by the mesh engine)
oracle = ServingEngine(CFG, params, max_batch=4, consume_params=False,
                       sampling=SamplingParams(greedy=True))
prompts = [[1, 2, 3], [7, 8, 9, 10], [42]]
want = {i: r.generated
        for i, r in enumerate(
            oracle.run(prompts, n_predict=6, stop_tokens=()).values())}

# 2-process tensor-parallel serving over the 8-device global mesh: every
# process runs the SAME host program (SPMD); fetched arrays (sampled
# tokens) are replicated, so both processes retire identical tokens
mesh = distributed.global_mesh((1, -1))
eng = ServingEngine(CFG, params, max_batch=4, mesh=mesh,
                    sampling=SamplingParams(greedy=True))
got = {i: r.generated
       for i, r in enumerate(
           eng.run(prompts, n_predict=6, stop_tokens=(),
                   chunk_steps=4).values())}
assert got == want, (got, want)

distributed.barrier("serve-done")
print(f"OK serve proc {jax.process_index()}")
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_two_process(tmp_path, worker_src, ok_marker, timeout=300):
    port = _free_port()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(worker_src)
    procs = []
    for pid in range(2):
        env = dict(
            os.environ,
            VSIM_REPO=repo,
            VSIM_COORDINATOR=f"127.0.0.1:{port}",
            VSIM_NUM_PROCESSES="2",
            VSIM_PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
            XLA_FLAGS="--xla_force_host_platform_device_count=4",
            TF_CPP_MIN_LOG_LEVEL="3",
        )
        procs.append(subprocess.Popen(
            [sys.executable, str(script)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
        assert ok_marker in out


@pytest.mark.slow
def test_two_process_cpu_mesh(tmp_path):
    _run_two_process(tmp_path, _WORKER, "OK proc")


@pytest.mark.slow
def test_two_process_serving(tmp_path):
    """Continuous-batching serving across a process boundary (VERDICT r3
    next #9): the TP ServingEngine on a 2-process × 4-device global mesh
    must retire byte-identical greedy tokens to the single-process
    engine."""
    _run_two_process(tmp_path, _SERVE_WORKER, "OK serve proc", timeout=600)
