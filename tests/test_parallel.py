"""Multi-chip sharding on the 8-device virtual CPU mesh: the sharded
refine step must agree with the single-device path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmvs_pmvs_tpu.geom import build_camera_set
from cmvs_pmvs_tpu.image import build_pyramids
from cmvs_pmvs_tpu.ops.refine import (
    make_problem, refine_patches, set_scales,
)
from cmvs_pmvs_tpu.parallel.sharding import (
    make_mesh, shard_views, sharded_refine_step,
)
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

LEVEL, WSIZE = 0, 7


def _setup(batch=16):
    scene = make_plane_scene(num_cameras=6, width=160, height=120)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = build_pyramids(list(scene.images), None, num_levels=3)
    import numpy.linalg as la
    rng = np.random.default_rng(7)
    pts = []
    for _ in range(batch):
        u, v = rng.uniform(40, 120), rng.uniform(30, 90)
        P = scene.P[0]
        C = scene.centers[0]
        X1 = la.solve(P[:, :3], np.array([u, v, 1.0]) - P[:, 3])
        d = X1 - C
        s = -(C @ scene.plane_n) / (d @ scene.plane_n)
        pts.append(C + s * d)
    pts = np.stack(pts)
    coord = jnp.asarray(np.concatenate([pts, np.ones((batch, 1))], 1),
                        jnp.float32)
    normal = jnp.asarray(np.tile(np.append(scene.plane_n, 0.0),
                                 (batch, 1)), jnp.float32)
    views = jnp.tile(jnp.arange(6, dtype=jnp.int32)[None], (batch, 1))
    valid = jnp.ones((batch, 6), bool)
    return scene, cams, pyr, coord, normal, views, valid


def test_mesh_shapes():
    mesh = make_mesh(8, view_parallel=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("patch", "view")


def test_shard_views_partition():
    views = jnp.asarray([[0, 3, 5, 2, 7]])
    valid = jnp.ones((1, 5), bool)
    vs, vv = shard_views(views, valid, 2)
    got = np.asarray(vs)[0]
    # every shard leads with the reference view 0
    assert (got[:, 0] == 0).all()
    # the other views are partitioned without loss
    others = sorted(x for x in got[:, 1:].ravel() if x >= 0)
    assert others == [2, 3, 5, 7]


def test_sharded_refine_matches_local():
    scene, cams, pyr, coord, normal, views, valid = _setup(16)
    dscale, _ = set_scales(cams, LEVEL, WSIZE, coord, views, valid)
    ray = coord - cams.center[jnp.zeros(16, jnp.int32)]
    ray = ray / jnp.linalg.norm(ray[:, :3], axis=1, keepdims=True)
    coord_bad = coord + 2.0 * dscale[:, None] * ray
    active = jnp.ones(16, bool)

    # local reference result
    prob = make_problem(cams, LEVEL, coord_bad, normal, views, valid,
                        dscale, 3)
    c_ref, n_ref, ncc_ref, _ = refine_patches(
        cams, pyr, LEVEL, WSIZE, prob, coord_bad, normal, num_iters=6)

    # sharded: 4-way patch x 2-way view
    mesh = make_mesh(8, view_parallel=2)
    step = sharded_refine_step(mesh, cams, pyr, LEVEL, WSIZE, 3,
                               csize=2, tn=6, gh=60, gw=80, num_iters=6)
    vs, vv = shard_views(views, valid, 2)
    c_sh, n_sh, ncc_sh, dmap = step(coord_bad, normal, vs, vv, dscale,
                                    active)

    # the sharded run must track the single-device run (identical psum'd
    # normal equations up to reduction order), measured in pixel units
    d_ref = scene.plane_distance(np.asarray(c_ref)[:, :3])
    d_sh = scene.plane_distance(np.asarray(c_sh)[:, :3])
    px = np.asarray(dscale)
    agree = np.abs(d_sh - d_ref) / px
    assert np.median(agree) < 0.1, agree
    assert np.quantile(agree, 0.9) < 0.5, agree
    # stragglers at 6 iters keep lower scores; the bulk is converged
    assert np.median(np.asarray(ncc_sh)) > 0.9
    assert np.asarray(ncc_sh).min() > 0.6
    # depth map: covered cells carry finite depths
    dm = np.asarray(dmap)
    assert np.isfinite(dm).sum() >= 16


def test_sharded_engine_matches_local(tmp_path):
    """Full engine cycle with the patch cloud GSPMD-sharded over the
    8-device mesh reproduces the single-device reconstruction
    (VERDICT r1 item 3: shard the whole engine, not just refine)."""
    import os
    from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
    from cmvs_pmvs_tpu.parallel.engine_shard import make_engine_mesh
    from cmvs_pmvs_tpu.utils.options import PMVSOptions
    from cmvs_pmvs_tpu.utils.synthetic import (
        make_plane_scene, write_pmvs_tree)

    root = str(tmp_path)
    sc = make_plane_scene(num_cameras=4, width=96, height=72, focal=160.0)
    write_pmvs_tree(sc, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\n"
                "minImageNum 3\nCPU 4\nsetEdge 0\nuseBound 0\n"
                "useVisData 0\nsequence -1\ntimages -1 0 4\noimages 0\n")
    opt = PMVSOptions.parse(os.path.join(root, "option.txt"))
    data = load_scene(root, opt)
    kwargs = dict(expand_iters=1, max_waves=1, refine_iters=4)

    mesh = make_engine_mesh(8)
    assert mesh.devices.size == 8
    eng_s = PMVSEngine(data, opt, p_cap=2048, log=lambda *a: None,
                       mesh=mesh)
    eng_s.run(**kwargs)
    eng_1 = PMVSEngine(data, opt, p_cap=2048, log=lambda *a: None)
    eng_1.run(**kwargs)

    n_s = int(np.asarray(eng_s.cloud.alive).sum())
    n_1 = int(np.asarray(eng_1.cloud.alive).sum())
    assert n_s > 50
    assert abs(n_s - n_1) <= max(2, n_1 // 20), (n_s, n_1)
    # geometry agreement at the cloud level: same surface
    d_s = sc.plane_distance(
        np.asarray(eng_s.cloud.coord)[np.asarray(eng_s.cloud.alive)][:, :3])
    d_1 = sc.plane_distance(
        np.asarray(eng_1.cloud.coord)[np.asarray(eng_1.cloud.alive)][:, :3])
    ds = np.asarray(eng_s.cloud.dscale)[np.asarray(eng_s.cloud.alive)]
    d1 = np.asarray(eng_1.cloud.dscale)[np.asarray(eng_1.cloud.alive)]
    assert np.median(d_s / ds) < 0.3
    assert np.median(d_1 / d1) < 0.3


@pytest.mark.slow
def test_sharded_engine_deep_protocol(tmp_path):
    """GSPMD equality beyond one wave (VERDICT r3 item 6): 2 expand
    iterations x 3 waves WITH the full filter stage (filters delete
    patches whose neighbors live on other shards) and auto-grow under
    the mesh (p_cap starts too small and must grow with sharded
    arrays). Equality bar: patch count within 1% + same surface.

    Nondeterminism note: sharded reductions reorder f32 sums, so
    borderline NCC/gain gates can flip individual patches; at this
    scene the count gap stays within 1%."""
    import os
    from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
    from cmvs_pmvs_tpu.parallel.engine_shard import make_engine_mesh
    from cmvs_pmvs_tpu.utils.options import PMVSOptions
    from cmvs_pmvs_tpu.utils.synthetic import (
        make_plane_scene, write_pmvs_tree)

    root = str(tmp_path)
    sc = make_plane_scene(num_cameras=4, width=96, height=72, focal=160.0)
    write_pmvs_tree(sc, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\n"
                "minImageNum 3\nCPU 4\nsetEdge 0\nuseBound 0\n"
                "useVisData 0\nsequence -1\ntimages -1 0 4\noimages 0\n")
    opt = PMVSOptions.parse(os.path.join(root, "option.txt"))
    data = load_scene(root, opt)
    kwargs = dict(expand_iters=2, max_waves=3, refine_iters=4)

    mesh = make_engine_mesh(8)
    eng_s = PMVSEngine(data, opt, p_cap=512, log=lambda *a: None,
                       mesh=mesh)
    eng_s.run(**kwargs)
    assert eng_s.p_cap > 512, "auto-grow never triggered under the mesh"
    eng_1 = PMVSEngine(data, opt, p_cap=512, log=lambda *a: None)
    eng_1.run(**kwargs)

    n_s = int(np.asarray(eng_s.cloud.alive).sum())
    n_1 = int(np.asarray(eng_1.cloud.alive).sum())
    assert n_s > 100
    assert abs(n_s - n_1) <= max(2, n_1 // 100), (n_s, n_1)
    d_s = sc.plane_distance(np.asarray(eng_s.cloud.coord)[
        np.asarray(eng_s.cloud.alive)][:, :3])
    ds = np.asarray(eng_s.cloud.dscale)[np.asarray(eng_s.cloud.alive)]
    assert np.median(d_s / ds) < 0.3
