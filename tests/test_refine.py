"""Refinement-kernel tests on the synthetic plane: the objective must be
near-zero at ground truth and Gauss-Newton must pull perturbed patches back
onto the plane (the acceptance test for replacing BOBYQA, SURVEY.md 7)."""
import numpy as np
import jax.numpy as jnp

from cmvs_pmvs_tpu.geom import build_camera_set
from cmvs_pmvs_tpu.image import build_pyramids
from cmvs_pmvs_tpu.ops.refine import (
    make_problem, set_scales, incc_objective, refine_patches,
)
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

LEVEL = 0
WSIZE = 7


def _setup(tilt=0.0):
    scene = make_plane_scene(num_cameras=6, width=320, height=240,
                             tilt=tilt)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = build_pyramids(list(scene.images), None, num_levels=LEVEL + 3)
    return scene, cams, pyr


def _plane_point(scene, u, v):
    """3D point where the ray of pixel (u, v) in camera 0 hits the plane."""
    import numpy.linalg as la
    P = scene.P[0]
    C = scene.centers[0]
    # a second point on the pixel ray: solve P X = [u, v, 1]
    X1 = la.solve(P[:, :3], np.array([u, v, 1.0]) - P[:, 3])
    d = X1 - C
    s = -(C @ scene.plane_n - scene.plane_d) / (d @ scene.plane_n)
    return C + s * d


def _batch(scene, cams, pts):
    b = len(pts)
    n = scene.num
    coord = jnp.asarray(np.concatenate([pts, np.ones((b, 1))], axis=1),
                        jnp.float32)
    nrm = np.tile(np.append(scene.plane_n, 0.0), (b, 1))
    normal = jnp.asarray(nrm, jnp.float32)
    views = jnp.tile(jnp.arange(n, dtype=jnp.int32)[None], (b, 1))
    valid = jnp.ones((b, n), bool)
    return coord, normal, views, valid


def test_objective_minimal_at_ground_truth():
    scene, cams, pyr = _setup()
    pts = np.stack([_plane_point(scene, u, v)
                    for u, v in [(160, 120), (140, 100), (190, 130)]])
    coord, normal, views, valid = _batch(scene, cams, pts)
    dscale, _ = set_scales(cams, LEVEL, WSIZE, coord, views, valid)
    prob = make_problem(cams, LEVEL, coord, normal, views, valid, dscale, 3)

    p_gt = jnp.zeros((3, 3), jnp.float32)
    f_gt, _, _ = incc_objective(cams, pyr, LEVEL, WSIZE, prob, p_gt)
    assert np.all(np.asarray(f_gt) < 0.02), np.asarray(f_gt)

    # depth off by 4 dscale units -> clearly worse
    p_off = p_gt.at[:, 0].set(4.0)
    f_off, _, _ = incc_objective(cams, pyr, LEVEL, WSIZE, prob, p_off)
    assert np.all(np.asarray(f_off) > np.asarray(f_gt) + 0.02), (
        np.asarray(f_gt), np.asarray(f_off))


def test_refine_recovers_plane():
    scene, cams, pyr = _setup()
    uv = [(160, 120), (140, 100), (190, 130), (120, 140), (200, 110)]
    pts = np.stack([_plane_point(scene, u, v) for u, v in uv])
    coord, normal, views, valid = _batch(scene, cams, pts)
    dscale, _ = set_scales(cams, LEVEL, WSIZE, coord, views, valid)
    prob = make_problem(cams, LEVEL, coord, normal, views, valid, dscale, 3)

    # perturb: 3 dscale units of depth + ~7.5 deg normal tilt
    rng = np.random.default_rng(3)
    ray = np.asarray(prob.rays)
    coord_bad = coord + 3.0 * np.asarray(dscale)[:, None] * ray
    tilt = np.deg2rad(7.5)
    n_bad = np.asarray(normal).copy()
    n_bad[:, :2] += np.sin(tilt) * rng.standard_normal((len(uv), 2))
    n_bad[:, :3] /= np.linalg.norm(n_bad[:, :3], axis=1, keepdims=True)

    c1, n1, ncc, f = refine_patches(
        cams, pyr, LEVEL, WSIZE, prob, jnp.asarray(coord_bad),
        jnp.asarray(n_bad), num_iters=30)

    d_before = scene.plane_distance(np.asarray(coord_bad)[:, :3])
    d_after = scene.plane_distance(np.asarray(c1)[:, :3])
    # dscale is roughly the 1px depth step; require sub-pixel accuracy
    px = np.asarray(dscale)
    assert np.all(d_after < 0.3 * px), (d_after / px)
    assert np.all(d_after < d_before)
    # normals: the NCC optimum is slightly off the true plane (the exact
    # ground truth scores *worse* on the objective than the converged
    # solution), so require "no worse than the perturbed start" on
    # average rather than exact recovery - matching how the reference
    # relies on filterQuad/filterNeighbor to clean normal noise.
    cos_init = np.abs(n_bad[:, :3] @ scene.plane_n)
    cos_fin = np.abs(np.asarray(n1)[:, :3] @ scene.plane_n)
    assert np.all(cos_fin > 0.93), cos_fin
    assert cos_fin.mean() >= cos_init.mean() - 0.01
    # photoconsistency after refinement
    assert np.all(np.asarray(ncc) > 0.95), np.asarray(ncc)


def test_refine_tilted_plane():
    scene, cams, pyr = _setup(tilt=0.35)
    pts = np.stack([_plane_point(scene, u, v)
                    for u, v in [(160, 120), (150, 135)]])
    coord, normal, views, valid = _batch(scene, cams, pts)
    dscale, _ = set_scales(cams, LEVEL, WSIZE, coord, views, valid)
    prob = make_problem(cams, LEVEL, coord, normal, views, valid, dscale, 3)

    coord_bad = coord + 2.0 * np.asarray(dscale)[:, None] * np.asarray(
        prob.rays)
    c1, n1, ncc, f = refine_patches(
        cams, pyr, LEVEL, WSIZE, prob, jnp.asarray(coord_bad), normal,
        num_iters=14)
    d_after = scene.plane_distance(np.asarray(c1)[:, :3])
    assert np.all(d_after < 0.75 * np.asarray(dscale)), (
        d_after, np.asarray(dscale))
    assert np.all(np.asarray(ncc) > 0.85)
