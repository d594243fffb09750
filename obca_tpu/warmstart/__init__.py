"""Warm-start pipeline (SURVEY.md §2.1 'Warm-start pipeline', §2.2 C6-C8).

TPU-native equivalents of the reference's warm-start stack:
  * `geometric`   — no-obstacle/interpolation primal warm start
                    (the reference's `WarmStart.jl` role)
  * `dual_ws`     — dual-variable initialization (`DualMultWS.jl` role)
  * `velosmooth`  — accel-limited velocity profile (`veloSmooth.jl` role)
  * `hybrid_astar` + `rs_path` + `grid_astar` — coarse kinematic path
                    search (H-OBCA `hybrid_a_star.jl` lineage)
"""

from obca_tpu.warmstart import dual_ws, geometric  # noqa: F401
