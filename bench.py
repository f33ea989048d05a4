"""Per-chip benchmark: hot-kernel throughput + end-to-end pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with an
"extra" dict carrying end-to-end numbers (steady-state reconstruction
patches/s and per-phase seconds on an occluded multi-object scene).

Headline metric: full Levenberg-Marquardt patch refinements per second -
each refinement runs `NUM_ITERS` LM iterations of 4 fused objective
evaluations (6-view x wsize^2 x RGB bilinear windows + NCC each),
matching the work profile of the reference's per-patch BOBYQA solve
(SURVEY.md 3.4). NUM_ITERS=8 is the engine default; on the bench scene
8 and 10 iterations converge identically (median plane offset 0.1347
vs 0.1348 dscale).

vs_baseline: the reference publishes no numbers (BASELINE.md) and its
binaries cannot be built here (vendored deps are fetched at configure
time; this container has no egress), so the baseline is a documented
estimate of 16-core CPU PMVS2 refine throughput: ~3000 patches/s
(BOBYQA at ~100 evals/patch, 6 views x 147 samples per eval, ~45 ns per
bilinear sample chain per core). Replace with a measured number when the
reference can be run.
"""
import json
import os
import shutil
import tempfile
import time

import numpy as np

BASELINE_PATCHES_PER_SEC = 3000.0   # estimated 16-core CPU PMVS2
BATCH = 8192
NUM_ITERS = 8


def bench_kernel():
    import jax
    import jax.numpy as jnp
    from cmvs_pmvs_tpu.geom import build_camera_set
    from cmvs_pmvs_tpu.image import build_pyramids
    from cmvs_pmvs_tpu.ops.refine import (
        _pallas_enabled, make_problem, refine_patches, set_scales,
    )
    from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

    scene = make_plane_scene(num_cameras=6, width=640, height=480,
                             focal=800.0)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = build_pyramids(list(scene.images), None, num_levels=3)
    if _pallas_enabled():
        from cmvs_pmvs_tpu.image.pyramid import with_tiles
        pyr = with_tiles(pyr)

    rng = np.random.default_rng(0)
    C = scene.centers[0]
    P = scene.P[0]
    us = rng.uniform(120, 520, BATCH)
    vs = rng.uniform(90, 390, BATCH)
    X1 = np.linalg.solve(
        P[:, :3], (np.stack([us, vs, np.ones(BATCH)], 0)
                   - P[:, 3:4])).T
    d = X1 - C
    s = -(C @ scene.plane_n) / (d @ scene.plane_n)
    pts = C + s[:, None] * d

    coord = jnp.asarray(np.concatenate([pts, np.ones((BATCH, 1))], 1),
                        jnp.float32)
    normal = jnp.asarray(np.tile(np.append(scene.plane_n, 0.0),
                                 (BATCH, 1)), jnp.float32)
    views = jnp.tile(jnp.arange(6, dtype=jnp.int32)[None], (BATCH, 1))
    valid = jnp.ones((BATCH, 6), bool)
    dscale, _ = set_scales(cams, 0, 7, coord, views, valid)

    # perturb so the solver does real work
    ray = coord - cams.center[jnp.zeros(BATCH, jnp.int32)]
    ray = ray / jnp.linalg.norm(ray[:, :3], axis=1, keepdims=True)
    noise = jnp.asarray(rng.uniform(-2, 2, BATCH)[:, None], jnp.float32)
    coord0 = coord + noise * dscale[:, None] * ray

    prob = make_problem(cams, 0, coord0, normal, views, valid, dscale, 3)

    @jax.jit
    def wave(coord, normal):
        c, nn, ncc, f = refine_patches(cams, pyr, 0, 7, prob, coord,
                                       normal, num_iters=NUM_ITERS)
        return c, nn, ncc

    out = wave(coord0, normal)       # compile + warmup
    jax.block_until_ready(out)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = wave(coord0, normal)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return BATCH / min(times)


def bench_e2e(budget_s: float = 520.0):
    """Steady-state end-to-end reconstruction throughput on the occluded
    multi-object scene: run once to compile every phase, then measure a
    fresh identically-shaped run (BASELINE.md: "reconstruction
    wall-clock ... at equal completeness")."""
    from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
    from cmvs_pmvs_tpu.utils.options import PMVSOptions
    from cmvs_pmvs_tpu.utils.synthetic import (
        make_occluded_scene, write_pmvs_tree)

    root = tempfile.mkdtemp(prefix="bench_e2e_")
    try:
        scene = make_occluded_scene(num_cameras=8, width=192, height=144,
                                    focal=300.0)
        write_pmvs_tree(scene, root)
        opt_path = os.path.join(root, "option.txt")
        with open(opt_path, "w") as f:
            f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\n"
                    "minImageNum 3\nCPU 4\nsetEdge 0\nuseBound 0\n"
                    "useVisData 0\nsequence -1\ntimages -1 0 8\n"
                    "oimages 0\n")
        opt = PMVSOptions.parse(opt_path)
        data = load_scene(root, opt)
        kwargs = dict(expand_iters=1, max_waves=2, refine_iters=8)

        t0 = time.time()
        eng = PMVSEngine(data, opt, p_cap=30000, log=lambda *a: None)
        eng.run(**kwargs)
        compile_run = time.time() - t0
        if time.time() - t0 > budget_s:
            # no time for a clean steady-state pass; report the cold run
            n = int(np.asarray(eng.cloud.alive).sum())
            return {"e2e_patches": n, "e2e_seconds": round(compile_run, 1),
                    "e2e_steady": False}

        t1 = time.time()
        eng2 = PMVSEngine(data, opt, p_cap=30000, log=lambda *a: None)
        eng2.run(**kwargs)
        steady = time.time() - t1
        n = int(np.asarray(eng2.cloud.alive).sum())
        phases = {}
        for name, sp in eng2.tracer.spans.items():
            top = name.split(".")[0]
            phases[top] = round(phases.get(top, 0.0) + sp.seconds, 2)
        return {"e2e_patches": n, "e2e_seconds": round(steady, 1),
                "e2e_patches_per_sec": round(n / steady, 1),
                "e2e_steady": True, "e2e_phase_seconds": phases}
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main():
    import sys
    pps = bench_kernel()
    line = {
        "metric": "patch_refinements_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "patches/s",
        "vs_baseline": round(pps / BASELINE_PATCHES_PER_SEC, 2),
    }
    # emit the headline immediately so a driver timeout during the
    # (compile-heavy) e2e stage cannot lose it; the final line repeats
    # it with the e2e numbers attached
    print(json.dumps(line), flush=True)
    if os.environ.get("BENCH_SKIP_E2E"):
        return
    try:
        extra = bench_e2e()
    except Exception as e:       # never lose the headline metric
        extra = {"e2e_error": f"{type(e).__name__}: {e}"[:200]}
    print(json.dumps({**line, "extra": extra}), flush=True)


if __name__ == "__main__":
    main()
