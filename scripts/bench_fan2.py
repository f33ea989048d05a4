"""v1 vs v2 fan-kernel timing on the real TPU at the bench shape.

Times `n_rep` back-to-back kernel calls inside one jitted scan (a
carried perturbation defeats CSE), so the ~25 ms axon dispatch latency
amortizes away - the in-engine regime. Run:
PYTHONPATH=/root/.axon_site:/root/repo python scripts/bench_fan2.py
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from cmvs_pmvs_tpu.ops.pallas_fan import build_tiles, incc_fan, tile_counts
from cmvs_pmvs_tpu.ops.pallas_fan2 import build_tiles2, incc_fan2, s2pl

N, H, WA = 6, 480, 1280
B, T, WSIZE = 8192, 6, 7
S2 = WSIZE * WSIZE
NREP = 10


def timeit(fn, *args):
    out = fn(*args)
    float(out.sum())          # scalar readback provably synchronizes
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out.sum())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    rng = np.random.default_rng(0)
    atlas = jnp.asarray(rng.integers(0, 255, (N, H, WA, 3),
                                     dtype=np.uint8))
    tiles = build_tiles(atlas)
    tiles2 = build_tiles2(atlas)
    ty, tx = tile_counts(H, WA)
    v = rng.integers(0, N, B * T)
    tyi = rng.integers(0, ty, B * T)
    txi = rng.integers(0, tx, B * T)
    tilemap = jnp.asarray((v << 20) | (tyi << 10) | txi, jnp.int32)
    tileidx = jnp.asarray((v * ty + tyi) * tx + txi, jnp.int32)

    for fan in (4, 1):
        # v1 geometry: (origin, dx2, dy2, pad) int/frac lines
        R = B * T * fan * 4
        geom = np.zeros((4, R), np.float32)
        geom[0, 0::4] = 14.0
        geom[1, 0::4] = 14.0
        geom[2, 0::4] = rng.uniform(0, 1, B * T * fan)
        geom[3, 0::4] = 0.25
        geom[0, 1::4] = 1.0
        geom[1, 2::4] = 1.0
        geom = jnp.asarray(geom)
        # v2.5 geometry: per-(pair, probe) affine frame scalars
        frames = np.zeros((8, B * T * fan), np.float32)
        frames[0:2] = rng.uniform(8.0, 20.0, (2, B * T * fan))
        frames[2] = 1.0
        frames[5] = 1.0
        frames = jnp.asarray(frames)

        def rep_v1(tiles, tilemap, geom):
            def body(acc, _):
                out = incc_fan(tiles, tilemap,
                               geom + acc * 1e-12, ppv=4, t=T,
                               fan=fan, s2=S2, wsize=WSIZE,
                               precise=False)
                return out.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=NREP)
            return acc

        def rep_v2(tiles2, tilemap, frames):
            def body(acc, _):
                out = incc_fan2(tiles2, tilemap,
                                frames + acc * 1e-12,
                                ppv=16 if fan == 1 else 4, t=T,
                                fan=fan, s2=S2, wsize=WSIZE,
                                precise=False)
                return out.mean(), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                  length=NREP)
            return acc

        evals = B * T * fan
        dt1 = timeit(jax.jit(rep_v1), tiles, tilemap, geom) / NREP
        print(f"fan={fan}  v1 {dt1 * 1000:7.2f} ms/call  "
              f"{evals / dt1 / 1e6:6.1f} M evals/s", flush=True)
        dt2 = timeit(jax.jit(rep_v2), tiles2, tilemap, frames) / NREP
        print(f"fan={fan}  v2 {dt2 * 1000:7.2f} ms/call  "
              f"{evals / dt2 / 1e6:6.1f} M evals/s  "
              f"({dt1 / dt2:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
