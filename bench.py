"""Per-chip benchmark: patch-refinement throughput of the hot kernel.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The measured quantity is full Gauss-Newton patch refinements per second -
each refinement evaluates the robust-INCC objective (6-view x wsize^2 x RGB
bilinear grabs + NCC) ~8x per iteration for 10 iterations, matching the
work profile of the reference's per-patch BOBYQA solve (SURVEY.md 3.4).

vs_baseline: the reference publishes no numbers (BASELINE.md) and its
binaries cannot be built here (vendored deps are fetched at configure
time; this container has no egress), so the baseline is a documented
estimate of 16-core CPU PMVS2 refine throughput: ~3000 patches/s
(BOBYQA at ~100 evals/patch, 6 views x 147 samples per eval, ~45 ns per
bilinear sample chain per core). Replace with a measured number when the
reference can be run.
"""
import json
import time

import numpy as np

BASELINE_PATCHES_PER_SEC = 3000.0   # estimated 16-core CPU PMVS2
BATCH = 8192
NUM_ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    from cmvs_pmvs_tpu.geom import build_camera_set
    from cmvs_pmvs_tpu.image import build_pyramids
    from cmvs_pmvs_tpu.ops.refine import (
        make_problem, refine_patches, set_scales,
    )
    from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

    scene = make_plane_scene(num_cameras=6, width=640, height=480,
                             focal=800.0)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = build_pyramids(list(scene.images), None, num_levels=3)
    from cmvs_pmvs_tpu.ops.refine import _pallas_enabled
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

    best = min(times)
    pps = BATCH / best
    print(json.dumps({
        "metric": "patch_refinements_per_sec_per_chip",
        "value": round(pps, 1),
        "unit": "patches/s",
        "vs_baseline": round(pps / BASELINE_PATCHES_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
