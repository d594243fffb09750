"""The hand-structured constraint Jacobian/Hessian (SURVEY.md §2.2 C11,
the TPU hot-path assembly) must agree with the AD reference on every
problem variant."""

import jax.numpy as jnp
import numpy as np
import pytest

from obca_tpu import nlp
from obca_tpu.spec import parallel_parking_spec, reverse_parking_spec


@pytest.mark.parametrize("fix_time", [True, False])
@pytest.mark.parametrize("signed", [True, False])
@pytest.mark.parametrize("maker", [reverse_parking_spec,
                                   parallel_parking_spec])
def test_analytic_matches_ad(maker, signed, fix_time):
    spec = maker(N=6, fix_time=fix_time, signed=signed)
    L = nlp.layout_of(spec)
    rng = np.random.default_rng(11)
    W = jnp.asarray(rng.normal(0.3, 0.7, (L.N + 1, L.nw)))
    nu = jnp.asarray(rng.normal(0.0, 1.5, (L.N + 1, L.nc)))
    J_ad, H_ad = nlp.constraint_blocks(L, W, nu, spec)
    J_an, H_an = nlp.constraint_blocks_analytic(L, W, nu, spec)
    np.testing.assert_allclose(np.asarray(J_an), np.asarray(J_ad),
                               atol=1e-12)
    np.testing.assert_allclose(np.asarray(H_an), np.asarray(H_ad),
                               atol=1e-12)
