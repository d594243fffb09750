"""Pallas TPU kernels for the solver hot paths (SURVEY.md §7 Phase 3,
BASELINE.json:5 "Pallas kernels ... at speed-of-light").

`blocktri_kernel` — batch-in-lanes block-tridiagonal quasidefinite
factorization and solve: the MUMPS-replacement (SURVEY.md §2.2 C10)
restructured so one kernel invocation processes 128 scenarios in the
TPU lane dimension, replacing thousands of per-stage XLA ops with a
single pipelined pass over the horizon.
"""

from obca_tpu.solver.pallas import blocktri_kernel  # noqa: F401
