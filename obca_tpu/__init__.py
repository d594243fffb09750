"""obca_tpu — a TPU-native Optimization-Based Collision Avoidance engine.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference repository ``XiaojingGeorgeZhang/OBCA`` (Zhang, Liniger, Borrelli —
"Optimization-Based Collision Avoidance", IEEE TCST 2021, arXiv:1711.03449;
and the companion autonomous-parking paper).  See ``SURVEY.md`` for the
component inventory and the mapping from the reference's Julia/JuMP/Ipopt
stack to this package's batched interior-point solver.

Layers (bottom-up):
  ``obca_tpu.geometry``   — polytope H-representations, signed distances
  ``obca_tpu.dynamics``   — kinematic bicycle discretization / rollout
  ``obca_tpu.obca``       — the dual / hyperplane-separation reformulation
  ``obca_tpu.nlp``        — stage-structured NLP: objective, constraints, KKT
  ``obca_tpu.solver``     — batched primal-dual interior-point + block-tridiag
  ``obca_tpu.warmstart``  — geometric / Hybrid-A* / velocity / dual warm starts
  ``obca_tpu.parallel``   — shard_map scale-out over scenario meshes
  ``obca_tpu.mpc``        — receding-horizon driver
  ``obca_tpu.nav``        — point-mass navigation problem family (the
                            reference's quadcopter-nav example)
"""

from obca_tpu.spec import (  # noqa: F401
    ProblemSpec,
    SolverConfig,
    Obstacles,
    reverse_parking_spec,
    parallel_parking_spec,
    mixed_solver_config,
    f32_solver_config,
)

__version__ = "0.1.0"
