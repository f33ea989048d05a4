"""Geometry-core tests against closed-form ground truth."""
import numpy as np
import jax.numpy as jnp

from cmvs_pmvs_tpu.geom import (
    CameraSet, build_camera_set, project, epipolar_distance,
    fundamental_matrix, get_paxes, get_unit, triangulate_dlt, unproject,
    depth_along_axis, PROJ_SENTINEL,
)
from cmvs_pmvs_tpu.geom.cameras import level_projection
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene


def _scene():
    return make_plane_scene(num_cameras=4, width=320, height=240)


def test_optical_center_projects_to_null():
    scene = _scene()
    cams = build_camera_set(scene.P)
    np.testing.assert_allclose(np.asarray(cams.center[:, :3]),
                               scene.centers, rtol=1e-4, atol=1e-4)
    # P @ [C;1] = 0
    res = np.einsum("nij,nj->ni", scene.P, np.asarray(cams.center))
    np.testing.assert_allclose(res, 0.0, atol=1e-2)


def test_project_unproject_roundtrip():
    scene = _scene()
    cams = build_camera_set(scene.P, dtype=jnp.float64)
    X = jnp.array([0.1, -0.2, 0.0, 1.0], dtype=jnp.float64)
    for level in (0, 2):
        ic = project(cams.P[0], X, level)
        assert float(ic[2]) == 1.0
        X2 = unproject(cams.P[0], ic, level)
        ic2 = project(cams.P[0], X2, level)
        np.testing.assert_allclose(np.asarray(ic2), np.asarray(ic), atol=1e-6)


def test_project_level_scaling():
    scene = _scene()
    cams = build_camera_set(scene.P)
    X = jnp.array([0.05, 0.1, 0.0, 1.0])
    p0 = np.asarray(project(cams.P[1], X, 0))
    p1 = np.asarray(project(cams.P[1], X, 1))
    np.testing.assert_allclose(p1[:2], p0[:2] / 2.0, rtol=1e-5)


def test_project_behind_camera_sentinel():
    scene = _scene()
    cams = build_camera_set(scene.P)
    # A point far behind the ring of cameras (z >> ring height)
    X = jnp.array([0.0, 0.0, 100.0, 1.0])
    p = np.asarray(project(cams.P[0], X, 0))
    assert p[0] == PROJ_SENTINEL and p[2] == -1.0


def test_triangulation_recovers_point():
    scene = _scene()
    cams = build_camera_set(scene.P, dtype=jnp.float64)
    X = jnp.array([0.15, -0.1, 0.0, 1.0], dtype=jnp.float64)
    level = 1
    P0 = level_projection(cams.P[0], level)
    P1 = level_projection(cams.P[2], level)
    ic0 = project(cams.P[0], X, level)[:2]
    ic1 = project(cams.P[2], X, level)[:2]
    Xhat = triangulate_dlt(P0, P1, ic0, ic1)
    np.testing.assert_allclose(np.asarray(Xhat), np.asarray(X), atol=1e-6)


def test_epipolar_distance_zero_for_correspondences():
    scene = _scene()
    cams = build_camera_set(scene.P, dtype=jnp.float64)
    F = fundamental_matrix(cams.P[0], cams.P[1], level=0)
    rng = np.random.default_rng(0)
    for _ in range(5):
        X = jnp.array([rng.uniform(-0.3, 0.3), rng.uniform(-0.3, 0.3),
                       0.0, 1.0], dtype=jnp.float64)
        p0 = project(cams.P[0], X, 0)
        p1 = project(cams.P[1], X, 0)
        d = float(epipolar_distance(F, p0, p1))
        assert d < 1e-3, d
    # moving p0 perpendicular to its epipolar line shows up ~1:1 in EPD
    line = F @ p1
    n = line[:2] / jnp.linalg.norm(line[:2])
    p0_off = p0 + jnp.concatenate([10.0 * n, jnp.zeros(1)])
    off = float(epipolar_distance(F, p0_off, p1))
    assert 9.0 < off < 11.0, off


def test_get_unit_is_one_pixel_footprint():
    scene = _scene()
    cams = build_camera_set(scene.P, dtype=jnp.float64)
    X = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float64)
    for level in (0, 1):
        unit = float(get_unit(cams, 0, X, level))
        # Moving by `unit` along the camera x axis moves ~1 px at `level`
        delta = jnp.concatenate([cams.xaxis[0] * unit, jnp.zeros(1)])
        p0 = project(cams.P[0], X, level)
        p1 = project(cams.P[0], X + delta, level)
        dist = float(jnp.linalg.norm((p1 - p0)[:2]))
        assert 0.5 < dist < 2.0, (level, dist)


def test_get_paxes_unit_pixel_steps():
    scene = _scene()
    cams = build_camera_set(scene.P, dtype=jnp.float64)
    X = jnp.array([0.1, 0.05, 0.0, 1.0], dtype=jnp.float64)
    n = jnp.array([0.0, 0.0, 1.0, 0.0], dtype=jnp.float64)
    px, py = get_paxes(cams, 0, X, n, level=0)
    p0 = project(cams.P[0], X, 0)
    dx = float(jnp.linalg.norm((project(cams.P[0], X + px, 0) - p0)[:2]))
    dy = float(jnp.linalg.norm((project(cams.P[0], X + py, 0) - p0)[:2]))
    np.testing.assert_allclose([dx, dy], [1.0, 1.0], rtol=1e-3)
    # axes orthogonal to the normal
    assert abs(float(px[:3] @ n[:3])) < 1e-8
    assert abs(float(py[:3] @ n[:3])) < 1e-8


def test_depth_along_axis_monotonic():
    scene = _scene()
    cams = build_camera_set(scene.P, dtype=jnp.float64)
    X = jnp.array([0.0, 0.0, 0.0, 1.0], dtype=jnp.float64)
    ray = X[:3] - cams.center[0, :3]
    ray = ray / jnp.linalg.norm(ray)
    X_far = jnp.concatenate([X[:3] + 0.5 * ray, jnp.ones(1)])
    d0 = float(depth_along_axis(cams, 0, X))
    d1 = float(depth_along_axis(cams, 0, X_far))
    assert d1 > d0


def test_batched_shapes():
    scene = _scene()
    cams = build_camera_set(scene.P)
    pts = jnp.concatenate(
        [jnp.asarray(np.random.default_rng(1).uniform(-0.2, 0.2, (17, 3))),
         jnp.ones((17, 1))], axis=1).astype(jnp.float32)
    out = project(cams.P[:, None], pts[None], 0)   # [N, 17, 3]
    assert out.shape == (scene.num, 17, 3)
    F = fundamental_matrix(cams.P[:, None], cams.P[None, :], 0)
    assert F.shape == (scene.num, scene.num, 3, 3)
