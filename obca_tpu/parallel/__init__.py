"""Scale-out: scenario-parallel execution over TPU device meshes.

The reference has zero parallelism (SURVEY.md §2.2 'Parallelism
strategy inventory'); every axis here is new design.  Scenario batches
shard over a 1-D `scenario` mesh axis (DP); per-solve math stays
device-local (the horizon fits on-chip at N = 80), and the only
collectives are metric reductions (`psum`) riding ICI.
"""

from obca_tpu.parallel import mesh  # noqa: F401
