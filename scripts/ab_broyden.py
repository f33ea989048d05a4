"""Equal-completeness A/B of the Broyden refresh schedule (VERDICT r4
item 4): 8-iter refresh-2 (engine default) vs 12-iter refresh-2 vs
8-iter all-full (refresh-1), on the bench plane scene (kernel accuracy
+ throughput) and the e2e occluded scene (reconstruction patches).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ab_broyden.py
Results table lives in docs/perf_model.md.
"""
import json
import os
import shutil
import tempfile
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      "/root/repo/.jax_cache")


def kernel_ab():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    from cmvs_pmvs_tpu.geom import build_camera_set
    from cmvs_pmvs_tpu.image import build_pyramids
    from cmvs_pmvs_tpu.image.pyramid import with_tiles
    from cmvs_pmvs_tpu.ops.refine import (make_problem, refine_patches,
                                          set_scales)
    from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

    B = 8192
    scene = make_plane_scene(num_cameras=6, width=640, height=480,
                             focal=800.0)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = with_tiles(build_pyramids(list(scene.images), None,
                                    num_levels=3))
    rng = np.random.default_rng(0)
    C = scene.centers[0]
    P = scene.P[0]
    us = rng.uniform(120, 520, B)
    vs = rng.uniform(90, 390, B)
    X1 = np.linalg.solve(P[:, :3], (np.stack([us, vs, np.ones(B)], 0)
                                    - P[:, 3:4])).T
    d = X1 - C
    sc = -(C @ scene.plane_n) / (d @ scene.plane_n)
    pts = C + sc[:, None] * d
    coord = jnp.asarray(np.concatenate([pts, np.ones((B, 1))], 1),
                        jnp.float32)
    normal = jnp.asarray(np.tile(np.append(scene.plane_n, 0.0), (B, 1)),
                         jnp.float32)
    views = jnp.tile(jnp.arange(6, dtype=jnp.int32)[None], (B, 1))
    valid = jnp.ones((B, 6), bool)
    dscale, _ = set_scales(cams, 0, 7, coord, views, valid)
    ray = coord - cams.center[jnp.zeros(B, jnp.int32)]
    ray = ray / jnp.linalg.norm(ray[:, :3], axis=1, keepdims=True)
    noise = jnp.asarray(rng.uniform(-2, 2, B)[:, None], jnp.float32)
    coord0 = coord + noise * dscale[:, None] * ray
    prob = make_problem(cams, 0, coord0, normal, views, valid, dscale, 3)

    out = {}
    for name, iters, refresh in (("broyden8", 8, 2), ("broyden12", 12, 2),
                                 ("allfull8", 8, 1)):
        import functools

        @functools.partial(jax.jit, static_argnames=("it", "rf"))
        def wave(coord, normal, it, rf):
            return refine_patches(cams, pyr, 0, 7, prob, coord, normal,
                                  num_iters=it, broyden_refresh=rf)[:3]

        res = wave(coord0, normal, it=iters, rf=refresh)
        jax.block_until_ready(res)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = wave(coord0, normal, it=iters, rf=refresh)
            jax.block_until_ready(res)
            ts.append(time.perf_counter() - t0)
        c = np.asarray(res[0])
        off = scene.plane_distance(c[:, :3]) / np.asarray(dscale)
        out[name] = {
            "iters": iters, "refresh": refresh,
            "median_offset_dscale": round(float(np.median(off)), 4),
            "p90_offset_dscale": round(
                float(np.quantile(off, 0.9)), 4),
            "refinements_per_sec": round(B / min(ts), 0),
            "median_ncc": round(float(np.median(np.asarray(res[2]))), 4),
        }
        print(name, out[name], flush=True)
    return out


def e2e_ab():
    from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
    from cmvs_pmvs_tpu.utils.options import PMVSOptions
    from cmvs_pmvs_tpu.utils.synthetic import (make_occluded_scene,
                                               write_pmvs_tree)
    import cmvs_pmvs_tpu.ops.refine as R

    out = {}
    root = tempfile.mkdtemp(prefix="ab_e2e_")
    try:
        scene = make_occluded_scene(num_cameras=8, width=192, height=144,
                                    focal=300.0)
        write_pmvs_tree(scene, root)
        with open(os.path.join(root, "option.txt"), "w") as f:
            f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\n"
                    "minImageNum 3\nCPU 4\nsetEdge 0\nuseBound 0\n"
                    "useVisData 0\nsequence -1\ntimages -1 0 8\n"
                    "oimages 0\n")
        opt = PMVSOptions.parse(os.path.join(root, "option.txt"))
        data = load_scene(root, opt)
        for name, iters, refresh in (("broyden8", 8, 2),
                                     ("broyden12", 12, 2),
                                     ("allfull8", 8, 1)):
            R.BROYDEN_REFRESH = refresh
            try:
                t0 = time.time()
                eng = PMVSEngine(data, opt, p_cap=30000,
                                 log=lambda *a: None)
                eng.run(expand_iters=1, max_waves=2, refine_iters=iters)
                dt = time.time() - t0
            finally:
                R.BROYDEN_REFRESH = 2
            n = int(np.asarray(eng.cloud.alive).sum())
            out[name] = {"patches": n, "seconds": round(dt, 1)}
            print(name, out[name], flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return out


if __name__ == "__main__":
    res = {"kernel": kernel_ab(), "e2e": e2e_ab()}
    print(json.dumps(res))
