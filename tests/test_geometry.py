import jax.numpy as jnp
import numpy as np

from obca_tpu import geometry, spec


def test_hrep_square():
    verts = np.array([(1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)])
    A, b = geometry.hrep_from_ccw_vertices(verts)
    # Interior point satisfies A y <= b strictly; exterior violates.
    assert np.all(A @ np.zeros(2) < b)
    assert np.any(A @ np.array([2.0, 0.0]) > b)
    # Each vertex is on exactly two faces.
    for v in verts:
        on = np.isclose(A @ v, b)
        assert on.sum() == 2


def test_hrep_clockwise_input():
    """CW vertex lists (the scenario tables' winding) must produce the
    same interior halfspaces as CCW — a silent flip yields an *empty*
    obstacle that the dual constraints certify as infinitely far."""
    ccw = np.array([(1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)])
    cw = ccw[::-1]
    A1, b1 = geometry.hrep_from_ccw_vertices(ccw)
    A2, b2 = geometry.hrep_from_ccw_vertices(cw)
    # Same set: interior point inside, outside point outside, for both.
    assert np.all(A1 @ np.zeros(2) < b1)
    assert np.all(A2 @ np.zeros(2) < b2)
    assert np.any(A2 @ np.array([2.0, 0.0]) > b2)
    # b must be consistent with a nonempty box: sum of opposite-face
    # offsets = box width (2), never negative.
    assert b2.sum() == 4.0


def test_hrep_normals_unit():
    verts = np.array([(2.0, 0.0), (0.0, 3.0), (-2.0, 0.0), (0.0, -3.0)])
    A, _ = geometry.hrep_from_ccw_vertices(verts)
    np.testing.assert_allclose(np.linalg.norm(A, axis=1), 1.0, atol=1e-12)


def test_point_polytope_distance():
    verts = np.array([(1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)])
    A, b = geometry.hrep_from_ccw_vertices(verts)
    A, b = jnp.asarray(A), jnp.asarray(b)
    mask = jnp.ones(4)
    d = geometry.point_polytope_distance(jnp.array([3.0, 0.0]), A, b, mask)
    np.testing.assert_allclose(float(d), 2.0, atol=1e-6)
    d_in = geometry.point_polytope_distance(jnp.array([0.2, 0.1]), A, b, mask)
    assert float(d_in) < 1e-8
    d_corner = geometry.point_polytope_distance(
        jnp.array([2.0, 2.0]), A, b, mask
    )
    np.testing.assert_allclose(float(d_corner), np.sqrt(2.0), atol=1e-5)


def test_ego_vertices():
    ego_g = jnp.array([3.7, 1.0, 1.0, 1.0])
    state = jnp.array([1.0, 2.0, 0.0, 0.0])
    v = geometry.ego_vertices(state, ego_g)
    np.testing.assert_allclose(
        np.asarray(v),
        [[4.7, 3.0], [4.7, 1.0], [0.0, 1.0], [0.0, 3.0]],
        atol=1e-12,
    )
    # 90 degree rotation.
    state = jnp.array([0.0, 0.0, np.pi / 2, 0.0])
    v = geometry.ego_vertices(state, ego_g)
    np.testing.assert_allclose(
        np.asarray(v),
        [[-1.0, 3.7], [1.0, 3.7], [1.0, -1.0], [-1.0, -1.0]],
        atol=1e-12,
    )


def test_ego_obstacle_distance():
    # Unit-ish square obstacle centered at (5, 0); ego axis-aligned at
    # origin: gap = 5 - 1(half side) - 3.7(front) = 0.3 facing it.
    obs = spec.obstacles_from_vertices(
        [[(6.0, 1.0), (4.0, 1.0), (4.0, -1.0), (6.0, -1.0)]]
    )
    state = jnp.array([0.0, 0.0, 0.0, 0.0])
    ego_g = jnp.array([3.7, 1.0, 1.0, 1.0])
    d = geometry.ego_obstacle_distance(
        state, ego_g, obs.A[0], obs.b[0], obs.face_mask[0]
    )
    np.testing.assert_allclose(float(d), 0.3, atol=1e-4)


def test_obstacles_padding():
    obs = spec.obstacles_from_vertices(
        [[(1.0, 1.0), (-1.0, 1.0), (-1.0, -1.0), (1.0, -1.0)],
         [(3.0, 0.0), (2.0, 1.0), (2.0, -1.0)]],
        max_obs=4, max_faces=6,
    )
    assert obs.A.shape == (4, 6, 2)
    assert float(obs.obs_mask.sum()) == 2.0
    assert float(obs.face_mask[0].sum()) == 4.0
    assert float(obs.face_mask[1].sum()) == 3.0
    # Padded faces are (A = 0, b = 0): trivially-true halfspaces that
    # contribute exactly NOTHING to the dual OBCA terms.  (b = 1 let a
    # negative padded lambda buy fake clearance through the dist row's
    # -lam*b term — the r5 padded-face leak; see
    # spec.obstacles_from_vertices.)
    np.testing.assert_allclose(np.asarray(obs.A[2]), 0.0)
    np.testing.assert_allclose(np.asarray(obs.b[2]), 0.0)
