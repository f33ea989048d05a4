"""Throughput-vs-device-count curve for the GSPMD refine wave (CPU mesh).

Runs the refine wave with the patch batch sharded over 1/2/4/8 virtual
CPU devices and prints ONE JSON line mapping device count to
refinements/s. This measures the sharded program's overhead and
correctness at each mesh size (VERDICT r3 item 6) - NOT real scaling:
the virtual devices share this host's physical cores (2 vCPUs on the
bench box), so the curve's value is the overhead profile + the evidence
that every mesh size compiles and runs; ICI-scale speedups require real
multi-chip hardware this environment does not have (BASELINE.md configs
4-5).

Run: python scripts/scaling_curve.py   (self-contained; forces CPU)
"""
import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")


def main():
    from jax.sharding import NamedSharding, PartitionSpec as P
    from cmvs_pmvs_tpu.geom import build_camera_set
    from cmvs_pmvs_tpu.image import build_pyramids
    from cmvs_pmvs_tpu.ops.refine import (
        make_problem, refine_patches, set_scales)
    from cmvs_pmvs_tpu.parallel.engine_shard import (
        make_engine_mesh, pin_cloud, pin_replicated)
    from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

    B = 1024
    scene = make_plane_scene(num_cameras=6, width=320, height=240,
                             focal=420.0)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = build_pyramids(list(scene.images), None, num_levels=3)

    rng = np.random.default_rng(0)
    C, Pm = scene.centers[0], scene.P[0]
    us = rng.uniform(60, 260, B)
    vs = rng.uniform(45, 195, B)
    X1 = np.linalg.solve(
        Pm[:, :3], (np.stack([us, vs, np.ones(B)], 0) - Pm[:, 3:4])).T
    d = X1 - C
    s = -(C @ scene.plane_n) / (d @ scene.plane_n)
    pts = C + s[:, None] * d
    coord = jnp.asarray(np.concatenate([pts, np.ones((B, 1))], 1),
                        jnp.float32)
    normal = jnp.asarray(np.tile(np.append(scene.plane_n, 0.0), (B, 1)),
                         jnp.float32)
    views = jnp.tile(jnp.arange(6, dtype=jnp.int32)[None], (B, 1))
    valid = jnp.ones((B, 6), bool)
    dscale, _ = set_scales(cams, 0, 7, coord, views, valid)
    prob = make_problem(cams, 0, coord, normal, views, valid, dscale, 3)

    curve = {}
    for nd in (1, 2, 4, 8):
        mesh = make_engine_mesh(nd)
        spec = NamedSharding(mesh, P("patch"))
        cs = jax.device_put(coord, spec)
        ns = jax.device_put(normal, spec)
        prob_s = jax.tree_util.tree_map(
            lambda a: jax.device_put(a, NamedSharding(
                mesh, P(*(("patch",) + (None,) * (a.ndim - 1)))))
            if hasattr(a, "ndim") and a.ndim >= 1 and a.shape[0] == B
            else a, prob)
        cams_r = pin_replicated(mesh, cams)
        pyr_r = pin_replicated(mesh, pyr)

        fn = jax.jit(lambda c, n: refine_patches(
            cams_r, pyr_r, 0, 7, prob_s, c, n, num_iters=4))
        out = fn(cs, ns)
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(cs, ns)
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        curve[str(nd)] = round(B / min(ts), 1)

    print(json.dumps({"cpu_mesh_refines_per_sec_by_devices": curve,
                      "note": "8 virtual devices share this host's "
                              "physical cores; measures GSPMD overhead "
                              "per mesh size, not chip scaling"}))


if __name__ == "__main__":
    main()
