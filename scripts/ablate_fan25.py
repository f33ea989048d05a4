"""v2.5 fan-kernel ablation: attribute the per-call cost to the new
in-kernel stages (expansion matmul, moment matmuls) vs the carried-over
v2 body. Variants patch a copy of ops/pallas_fan2._fan2_kernel:

  full       - the production v2.5 kernel
  no_moments - skip the 3 segment-sum matmuls + ref tiling (write S only
               as a q slice)
  no_expand  - skip the expansion matmul (rel = iota constants)
  body_only  - both of the above (the v2 per-pair body alone)

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablate_fan25.py
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
from cmvs_pmvs_tpu.ops.pallas_fan2 import K, _l128, build_tiles2, s2pl

N, H, WA = 6, 480, 1280
B, T, WSIZE = 8192, 6, 7
S2 = WSIZE * WSIZE
NREP = 10


def _kernel_abl(tilemap_ref, *refs, ppv, t, fan, s2, s2pL, wsize, mode):
    pv = ppv * t
    tile_refs = refs[:pv]
    frames_ref = refs[pv]
    seg_ref = refs[pv + 1]
    out_ref = refs[pv + 2]
    SPAIR = fan * s2pL
    LTOT = pv * SPAIR
    f32 = jnp.float32
    margin = wsize // 2
    rowi = jax.lax.broadcasted_iota(jnp.int32, (K, SPAIR), 0).astype(f32)
    foldp = (jax.lax.broadcasted_iota(jnp.int32, (3, 3 * K), 1) // K
             == jax.lax.broadcasted_iota(jnp.int32, (3, 3 * K), 0)
             ).astype(f32)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    def mmT(a, b):
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LTOT), 1)
    sidx = lane % s2pL
    gx = (sidx % wsize - margin).astype(f32)
    gy = (sidx // wsize - margin).astype(f32)
    pad_s = sidx >= s2
    if mode in ("no_expand", "body_only"):
        relx = jnp.where(pad_s, -1000.0, gx + 14.0)
        rely = jnp.where(pad_s, -1000.0, gy + 14.0)
    else:
        Ef = mm(frames_ref[0, :, :], seg_ref[:, :])
        relx = jnp.where(pad_s, -1000.0,
                         Ef[0:1] + gx * Ef[2:3] + gy * Ef[4:5])
        rely = jnp.where(pad_s, -1000.0,
                         Ef[1:2] + gx * Ef[3:4] + gy * Ef[5:6])

    def body(q_ref, tex_ref, rft_ref):
        for p in range(pv):
            rx = relx[0:1, p * SPAIR:(p + 1) * SPAIR]
            ry = rely[0:1, p * SPAIR:(p + 1) * SPAIR]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - rowi))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - rowi))
            tile = tile_refs[p][0, 0, 0][:, :K]
            tb = tile.astype(jnp.int32).astype(jnp.bfloat16)
            rows = mm(tb, wy.astype(jnp.bfloat16))
            for c in range(3):
                q_ref[c * K:(c + 1) * K, p * SPAIR:(p + 1) * SPAIR] = \
                    rows[c * K:(c + 1) * K, :] * wx
        tex_ref[:, :] = mm(foldp, q_ref[:])
        if mode in ("no_moments", "body_only"):
            out_ref[0, 0:16, :] = jnp.broadcast_to(
                tex_ref[0:1, 0:128], (16, 128))
            return
        for pp in range(ppv):
            base = pp * t * SPAIR
            refw = tex_ref[:, base:base + SPAIR]
            for v in range(t):
                rft_ref[:, base + v * SPAIR:base + (v + 1) * SPAIR] = refw
        tex = tex_ref[:, :]
        out_ref[0, 0:3, :] = mmT(tex, seg_ref[:, :])
        out_ref[0, 3:6, :] = mmT(tex * tex, seg_ref[:, :])
        out_ref[0, 6:9, :] = mmT(tex * rft_ref[:, :], seg_ref[:, :])
        out_ref[0, 9:16, :] = jnp.zeros((7, 128), f32)

    pl.run_scoped(body,
                  q_ref=pltpu.VMEM((3 * K, LTOT), f32),
                  tex_ref=pltpu.VMEM((3, LTOT), f32),
                  rft_ref=pltpu.VMEM((3, LTOT), f32))


@functools.partial(jax.jit, static_argnames=("ppv", "fan", "mode"))
def call_abl(tiles2, tilemap, frames, *, ppv, fan, mode):
    # this harness keeps the pre-pack2 per-pair layout (its kernel copy
    # has no duo path), so fan=1 pins the old 128-lane block
    s2L = max(s2pl(S2, fan), 128 // fan)
    SPAIR = fan * s2L
    bt = tilemap.shape[0]
    b0 = bt // T
    pv = ppv * T
    L128 = _l128(pv, fan)
    nsteps = b0 // ppv
    LTOT = pv * SPAIR

    f2 = frames.reshape(8, nsteps, pv * fan)
    f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, L128 - pv * fan)))
    f2 = jnp.moveaxis(f2, 0, 1)
    li = jax.lax.broadcasted_iota(jnp.int32, (L128, LTOT), 1)
    ji = jax.lax.broadcasted_iota(jnp.int32, (L128, LTOT), 0)
    seg = (li // s2L == ji).astype(jnp.float32)

    import os
    if os.environ.get("ABL_DYN_CONST_IMAP"):
        # same tile every step, but only knowable at RUNTIME: tests
        # whether the pipeline's revisit skip is dynamic or static
        def tile_spec(j):
            def imap(i, m):
                c = m[j]
                return (c >> 20, (c >> 10) & 0x3FF, c & 0x3FF, 0, 0)
            return pl.BlockSpec((1, 1, 1, 3 * K, 128), imap,
                                memory_space=pltpu.VMEM)
    elif os.environ.get("ABL_CONST_IMAP"):
        # every fetch pinned to one tile: isolates the DMA-issue cost
        # (the pipeline skips the copy when the block index repeats)
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[tile_spec(j) for j in range(pv)]
        + [pl.BlockSpec((1, 8, L128), lambda i, m: (i, 0, 0),
                        memory_space=pltpu.VMEM),
           pl.BlockSpec((L128, LTOT), lambda i, m: (0, 0),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 16, 128), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_kernel_abl, ppv=ppv, t=T, fan=fan,
                               s2=S2, s2pL=s2L, wsize=WSIZE, mode=mode)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsteps, 16, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tilemap, *([tiles2] * pv), f2, seg)


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

    for fan in (4, 1):
        frames = np.zeros((8, B * T * fan), np.float32)
        frames[0:2] = rng.uniform(8.0, 20.0, (2, B * T * fan))
        frames[2] = 1.0
        frames[5] = 1.0
        frames = jnp.asarray(frames)
        for mode in ("full", "no_moments", "no_expand", "body_only"):
            def rep(tiles2, tilemap, frames, mode=mode, fan=fan):
                def body(acc, _):
                    out = call_abl(tiles2, tilemap, frames + acc * 1e-12,
                                   ppv=4, fan=fan, mode=mode)
                    return out.mean(), None
                acc, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                      length=NREP)
                return acc
            f = jax.jit(rep)
            float(f(tiles2, tilemap, frames))
            ts = []
            for _ in range(5):
                t0 = time.perf_counter()
                float(f(tiles2, tilemap, frames))
                ts.append(time.perf_counter() - t0)
            dt = min(ts) / NREP
            print(f"fan={fan} {mode:10s} {dt * 1000:7.2f} ms/call",
                  flush=True)


if __name__ == "__main__":
    main()
