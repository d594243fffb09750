"""Warm-start pipeline (SURVEY.md §2.1 'Warm-start pipeline', §2.2 C6-C8).

TPU-native equivalents of the reference's warm-start stack:
  * `geometric`   — no-obstacle/interpolation primal warm start
                    (the reference's `WarmStart.jl` role)
  * `dual_ws`     — dual-variable initialization (`DualMultWS.jl` role)
  * `velosmooth`  — accel-limited velocity profile (`veloSmooth.jl` role)
  * `lattice` + `rs_path` — coarse kinematic path search: dense SE(2)
                    lattice value iteration + branchless Reeds-Shepp
                    (the TPU-first redesign of the H-OBCA
                    `hybrid_a_star.jl` lineage)
"""

from obca_tpu.warmstart import dual_ws, geometric  # noqa: F401
