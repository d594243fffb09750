"""Visualization smoke tests (reference `plotTraj.jl` counterpart, C12)."""

import numpy as np
import pytest

from obca_tpu import viz
from obca_tpu.spec import reverse_parking_spec
from obca_tpu.warmstart import geometric


def test_ego_corners_axis_aligned():
    # At psi=0, corners are (front/rear, +-half_w) around (X, Y).
    x = np.array([1.0, 2.0, 0.0, 0.0])
    g = np.array([3.7, 1.0, 1.0, 1.0])
    c = viz.ego_corners(x, g)
    assert c.shape == (4, 2)
    assert np.isclose(c[:, 0].max(), 1.0 + 3.7)
    assert np.isclose(c[:, 0].min(), 1.0 - 1.0)
    assert np.isclose(c[:, 1].max(), 2.0 + 1.0)
    assert np.isclose(c[:, 1].min(), 2.0 - 1.0)


def test_ego_corners_rotation_preserves_shape():
    g = np.array([3.7, 1.0, 1.0, 1.0])
    c0 = viz.ego_corners(np.array([0.0, 0.0, 0.0, 0.0]), g)
    c1 = viz.ego_corners(np.array([0.0, 0.0, 0.7, 0.0]), g)
    # Rigid rotation: pairwise edge lengths unchanged.
    d0 = np.linalg.norm(np.roll(c0, 1, axis=0) - c0, axis=1)
    d1 = np.linalg.norm(np.roll(c1, 1, axis=0) - c1, axis=1)
    np.testing.assert_allclose(np.sort(d0), np.sort(d1), atol=1e-12)


def test_plot_trajectory_writes_png(tmp_path):
    pytest.importorskip("matplotlib")
    spec = reverse_parking_spec(N=10, Ts=1.0)
    X = np.asarray(geometric.interpolated_states(spec))
    U = np.zeros((spec.N, 2))
    out = viz.plot_trajectory(spec, X, U, path=str(tmp_path / "t.png"),
                              title="smoke")
    assert (tmp_path / "t.png").stat().st_size > 0
    assert out.endswith("t.png")


def test_animation_frames(tmp_path):
    pytest.importorskip("matplotlib")
    spec = reverse_parking_spec(N=6, Ts=1.0)
    X = np.asarray(geometric.interpolated_states(spec))
    paths = viz.save_animation_frames(spec, X, str(tmp_path), stride=3)
    assert len(paths) == 3
    for p in paths:
        assert np.greater((tmp_path / p.split("/")[-1]).stat().st_size, 0)
