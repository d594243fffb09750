"""Two-process CPU-backend distributed test (SURVEY.md §4.4): the
multi-host code path (`jax.distributed.initialize` + global mesh +
psum'd metrics) exercised with two local processes — no pod needed."""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> str:
    """Bind an ephemeral port and release it — avoids the hardcoded-
    port flake when CI jobs run this test concurrently (ADVICE r2)."""
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return str(s.getsockname()[1])

_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
repo = sys.argv[4]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
sys.path.insert(0, repo)

from obca_tpu.parallel import distributed

distributed.initialize(coordinator_address=f"localhost:{port}",
                       num_processes=nproc, process_id=pid)
assert jax.process_count() == nproc
mesh = distributed.global_scenario_mesh()
assert mesh.devices.size == 2 * nproc

import dataclasses
import jax.numpy as jnp
from obca_tpu.parallel import mesh as mesh_mod
from obca_tpu.spec import SolverConfig, reverse_parking_spec

base = reverse_parking_spec(N=8, Ts=2.0)
n = mesh.devices.size
shifts = jnp.linspace(-0.2, 0.2, n)
specs = jax.tree.map(
    lambda *xs: jnp.stack(xs),
    *[dataclasses.replace(base, x0=base.x0.at[0].add(s)) for s in shifts],
)
res, metrics = mesh_mod.dryrun_step(specs, SolverConfig(max_iter=3), mesh)
# the metric reduction crossed both processes
assert res.U.shape == (n, 8, 2)
print("WORKER_OK", pid, int(metrics["n_converged"]))
"""


@pytest.mark.skipif(os.environ.get("OBCA_SKIP_MULTIPROC") == "1",
                    reason="multi-process test disabled")
def test_two_process_cpu_mesh(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    here = os.path.dirname(os.path.abspath(__file__))
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(pid), "2", port,
             os.path.dirname(here)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            cwd=os.path.dirname(here), env=env, text=True,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=420)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "WORKER_OK" in out
