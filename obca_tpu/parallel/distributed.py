"""Multi-host initialization and global scenario mesh (SURVEY.md §5
'Distributed communication backend'; BASELINE.json:5 scaling report).

The workload is scenario-parallel SPMD: every host runs the same
program on its shard of the scenario batch, ICI carries the (tiny)
metric psums inside a slice and DCN across slices.  This module is the
only place that touches `jax.distributed`; single-process runs never
import it.

Usage (one call per process, before any other JAX operation):

    from obca_tpu.parallel import distributed
    distributed.initialize()          # env-driven (TPU pods: automatic)
    mesh = distributed.global_scenario_mesh()

On Cloud TPU pods `jax.distributed.initialize()` discovers everything
from the metadata server; elsewhere pass coordinator_address /
num_processes / process_id explicitly (see the 2-process CPU test,
tests/test_multiprocess.py).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids=None) -> None:
    """Initialize `jax.distributed` exactly once per process.

    All-None arguments use JAX's automatic environment discovery (TPU
    pod metadata / SLURM / OpenMPI).  Safe to call in single-process
    runs only when explicitly parameterized — bare single-process use
    should simply not call it.
    """
    global _initialized
    if _initialized:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _initialized = True


def global_scenario_mesh(name: str = "scenario") -> Mesh:
    """1-D mesh over every device in the job (all hosts)."""
    return Mesh(np.asarray(jax.devices()), (name,))


def process_shard(n_total: int) -> slice:
    """The contiguous scenario range this process should *build*
    host-side for a globally sharded batch of n_total scenarios
    (scenario construction is host-side numpy; each host materializes
    only its slice)."""
    p = jax.process_index()
    np_ = jax.process_count()
    per = -(-n_total // np_)
    lo = min(p * per, n_total)
    return slice(lo, min(lo + per, n_total))
