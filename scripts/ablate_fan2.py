"""v2 fan-kernel ablation: attribute the 10 ms/call to stages.

Variants cut stages out of a copy of ops/pallas_fan2._fan2_kernel:
  full     - the production kernel
  no_x     - skip the wx build + per-channel multiply (rows written raw)
  no_mm    - skip the y-interp matmul (wy tiled x3 by concat instead)
  wy_only  - only the wy hat build per pair (write into q rows 0:32)
  no_fold  - per-pair work intact, fold matmul replaced by q slice
  dma_only - no per-pair compute at all
Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablate_fan2.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from cmvs_pmvs_tpu.ops.pallas_fan import tile_counts
from cmvs_pmvs_tpu.ops.pallas_fan2 import K, build_tiles2, s2pl

N, H, WA = 6, 480, 1280
B, T, WSIZE = 8192, 6, 7
S2 = WSIZE * WSIZE
NREP = 10


def _kernel_abl(tilemap_ref, *refs, ppv, t, fan, s2pL, mode):
    pv = ppv * t
    tile_refs = refs[:pv]
    rel_ref = refs[pv]
    out_ref = refs[pv + 1]
    SPAIR = fan * s2pL
    LTOT = pv * SPAIR
    f32 = jnp.float32
    rowi = jax.lax.broadcasted_iota(jnp.int32, (K, SPAIR), 0).astype(f32)
    foldp = (jax.lax.broadcasted_iota(jnp.int32, (8, 3 * K), 1) // K
             == jax.lax.broadcasted_iota(jnp.int32, (8, 3 * K), 0)
             ).astype(f32)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    def body(q_ref):
        if mode != "dma_only":
            for p in range(pv):
                relx = rel_ref[0:1, p * SPAIR:(p + 1) * SPAIR]
                rely = rel_ref[1:2, p * SPAIR:(p + 1) * SPAIR]
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(rely - rowi))
                if mode == "wy_only":
                    q_ref[0:K, p * SPAIR:(p + 1) * SPAIR] = wy
                    continue
                tile = tile_refs[p][0, 0, 0][:, :K]
                tb = tile.astype(jnp.int32).astype(jnp.bfloat16)
                if mode == "no_mm":
                    rows = jnp.concatenate([wy, wy, wy], axis=0)
                else:
                    rows = mm(tb, wy.astype(jnp.bfloat16))
                if mode == "no_x":
                    for c in range(3):
                        q_ref[c * K:(c + 1) * K,
                              p * SPAIR:(p + 1) * SPAIR] = \
                            rows[c * K:(c + 1) * K, :]
                else:
                    wx = jnp.maximum(0.0, 1.0 - jnp.abs(relx - rowi))
                    for c in range(3):
                        q_ref[c * K:(c + 1) * K,
                              p * SPAIR:(p + 1) * SPAIR] = \
                            rows[c * K:(c + 1) * K, :] * wx
        if mode in ("dma_only", "no_fold"):
            out_ref[0] = q_ref[0:8, :out_ref.shape[2]]
        else:
            out_ref[0] = mm(foldp, q_ref[:])[:, :out_ref.shape[2]]

    pl.run_scoped(body, q_ref=pltpu.VMEM((3 * K, LTOT), f32))


@functools.partial(jax.jit, static_argnames=("ppv", "fan", "mode"))
def call_abl(tiles2, tilemap, rel, *, ppv, fan, mode):
    s2L = s2pl(S2, fan)
    SPAIR = fan * s2L
    bt = tilemap.shape[0]
    b0 = bt // ppv // T * ppv  # assume divisible
    pv = ppv * T
    nsteps = b0 // ppv
    LTOT = pv * SPAIR

    import os
    if os.environ.get("ABL_CONST_IMAP"):
        def tile_spec(j):
            return pl.BlockSpec((1, 1, 1, 3 * K, 128),
                                lambda i, m: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        def tile_spec(j):
            def imap(i, m):
                c = m[i * pv + j]
                return (c >> 20, (c >> 10) & 0x3FF, c & 0x3FF, 0, 0)
            return pl.BlockSpec((1, 1, 1, 3 * K, 128), imap,
                                memory_space=pltpu.VMEM)

    tiny_out = bool(os.environ.get("ABL_TINY_OUT"))
    OUTL = 128 if tiny_out else LTOT
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[tile_spec(j) for j in range(pv)]
        + [pl.BlockSpec((2, LTOT), lambda i, m: (0, i),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 8, OUTL), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel_abl, ppv=ppv, t=T, fan=fan,
                               s2pL=s2L, mode=mode)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsteps, 8, OUTL), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tilemap, *([tiles2] * pv), rel)


def main():
    rng = np.random.default_rng(0)
    atlas = jnp.asarray(rng.integers(0, 255, (N, H, WA, 3),
                                     dtype=np.uint8))
    tiles2 = build_tiles2(atlas)
    ty, tx = tile_counts(H, WA)
    v = rng.integers(0, N, B * T)
    tyi = rng.integers(0, ty, B * T)
    txi = rng.integers(0, tx, B * T)
    tilemap = jnp.asarray((v << 20) | (tyi << 10) | txi, jnp.int32)
    fan = 4
    s2L = s2pl(S2, fan)
    L = B * T * fan * s2L
    rel = np.full((2, L), -1000.0, np.float32)
    live = np.arange(L) % s2L < S2
    rel[:, live] = rng.uniform(4.0, 26.0, (2, int(live.sum())))
    rel = jnp.asarray(rel)

    import os
    for ppv in (4,):
        for mode in ("full", "no_x", "no_mm", "wy_only", "no_fold",
                     "dma_only"):
            def rep(tiles2, tilemap, rel, ppv=ppv, mode=mode):
                def body(acc, _):
                    out = call_abl(tiles2, tilemap, rel + acc * 1e-12,
                                   ppv=ppv, fan=fan, mode=mode)
                    return out.mean(), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=NREP)
                return acc
            f = jax.jit(rep)
            float(f(tiles2, tilemap, rel))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(tiles2, tilemap, rel))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / NREP
            print(f"ppv={ppv:2d} {mode:9s} {dt * 1000:7.2f} ms/call",
                  flush=True)


if __name__ == "__main__":
    main()
