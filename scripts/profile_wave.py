"""xprof capture + top-op summary for one refine wave on the TPU.

Captures jax.profiler traces of 3 waves at the bench shape, then prints
the top device events by total duration (parsed from the trace.json.gz)
so the XLA-side overhead of the wave is attributable op by op.
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/profile_wave.py [outdir]
"""
import collections
import glob
import gzip
import json
import os
import sys

import numpy as np


def capture(outdir):
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

    @jax.jit
    def wave(coord, normal):
        c, nn, ncc, f = refine_patches(cams, pyr, 0, 7, prob, coord,
                                       normal, num_iters=8)
        return c, nn, ncc

    out = wave(coord0, normal)
    jax.block_until_ready(out)
    float(out[0].sum())
    with jax.profiler.trace(outdir):
        for _ in range(3):
            out = wave(coord0, normal)
            float(out[0].sum())


def summarize(outdir, top=40):
    paths = glob.glob(os.path.join(outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        print("no trace found under", outdir)
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device-lane complete events: pid/tid lanes named like TPU XLA Ops
    pids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pids.get(e.get("pid"), "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "?")
        dur[name] += e.get("dur", 0)
        cnt[name] += 1
    total = sum(dur.values())
    print(f"trace: {path}")
    print(f"total device op time: {total / 1e3:.1f} ms (3 waves)")
    for name, d in dur.most_common(top):
        print(f"{d / 1e3 / 3:9.2f} ms/wave  x{cnt[name] // 3:<4d} "
              f"{name[:90]}")


if __name__ == "__main__":
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wave_profile"
    if not os.environ.get("SUMMARIZE_ONLY"):
        capture(outdir)
    summarize(outdir)
