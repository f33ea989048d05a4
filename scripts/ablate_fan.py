"""Fan-kernel ablation bench: where does the time actually go?

Measures incc_fan variants with pipeline stages disabled, on the real
TPU at the bench shape (B=8192, t=6, fan=4, wsize=7), to attribute
kernel time to: tile DMA, the wy matmul, the wx3/fold channel path, and
the moments/NCC section. Drives the round-4 speed-of-light analysis
(VERDICT r3 weak 1).

Run: PYTHONPATH=/root/.axon_site:/root/repo python scripts/ablate_fan.py
"""
import functools
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmvs_pmvs_tpu.ops.pallas_fan import (
    SP, TILE_PX, TILE_STRIDE, _round_up, build_tiles, tile_counts)

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _fan_kernel_abl(tilemap_ref, *refs, ppv, t, fan, s2, wsize, mode):
    pv = ppv * t
    tile_refs = refs[:pv]
    geom_ref = refs[pv]
    out_ref = refs[pv + 1]
    K = TILE_PX
    s2p = _round_up(s2, 8)
    R = fan * s2p
    SR = SP * R
    nstack = pv // SP
    GS = SP * fan * 4
    margin = wsize // 2
    f32 = jnp.float32

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    rs1 = jax.lax.broadcasted_iota(jnp.int32, (SR, 1), 0)
    s_idx = rs1 % s2p
    pad_row = s_idx >= s2
    gx = (s_idx % wsize - margin).astype(f32)
    gy = (s_idx // wsize - margin).astype(f32)
    pfl = rs1 // s2p
    gcol = jax.lax.broadcasted_iota(jnp.int32, (SR, GS), 1)
    sel = (gcol // 4 == pfl).astype(f32)
    u = jnp.where(gcol % 4 == 0, 1.0,
                  jnp.where(gcol % 4 == 1, gx,
                            jnp.where(gcol % 4 == 2, gy, 0.0)))
    selg = sel * u

    rsw = jax.lax.broadcasted_iota(jnp.int32, (SR, SP * K), 0)
    lsw = jax.lax.broadcasted_iota(jnp.int32, (SR, SP * K), 1)
    stackmask = (lsw // K == rsw // R).astype(f32)
    colk = (lsw % K).astype(f32)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (SR, 3 * K), 1)
    colx3 = (col3 // 3).astype(f32)
    xmask = jnp.where(pad_row, 0.0, 1.0)
    fold = (jax.lax.broadcasted_iota(jnp.int32, (3 * K, 8), 0) % 3
            == jax.lax.broadcasted_iota(jnp.int32, (3 * K, 8), 1)
            ).astype(f32)

    def body(tex_ref):
        if mode != "dma_only":
            for s in range(nstack):
                gT = geom_ref[:, pl.ds(s * GS, GS)]
                relq = jax.lax.dot_general(
                    selg, gT, (((1,), (1,)), ((), ())),
                    preferred_element_type=f32)
                relx = relq[:, 0:1] + relq[:, 2:3]
                rely = relq[:, 1:2] + relq[:, 3:4]
                regs = [tile_refs[s * SP + j][0, 0, 0] for j in range(SP)]
                regstack = jnp.concatenate(regs, axis=0)
                regstack = regstack.astype(jnp.int32).astype(f32)
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(rely - colk)) \
                    * stackmask
                if mode == "wy_only":
                    rows = mm(wy.astype(jnp.bfloat16),
                              regstack.astype(jnp.bfloat16))
                    tex_ref[pl.ds(s * SR, SR), :] = rows[:, :3]
                else:
                    wx3 = jnp.maximum(
                        0.0, 1.0 - jnp.abs(relx - colx3)) * xmask
                    wy_bf = wy.astype(jnp.bfloat16)
                    rows = mm(wy_bf, regstack.astype(jnp.bfloat16))
                    q = (rows * wx3).astype(jnp.bfloat16)
                    tex8 = mm(q, fold.astype(jnp.bfloat16))
                    tex_ref[pl.ds(s * SR, SR), :] = tex8[:, :3]

        if mode in ("dma_only", "no_moments", "wy_only"):
            if mode == "dma_only":
                out_ref[:] = jnp.zeros_like(out_ref)
            else:
                tex = tex_ref[:].reshape(ppv, t, fan, s2p, 3)
                out_ref[:] = tex[:, :, :, 0, 0:1]
            return

        tex = tex_ref[:].reshape(ppv, t, fan, s2p, 3)
        texr = tex[:, 0:1]
        inv_s2 = 1.0 / s2
        inv_3s2 = 1.0 / (3.0 * s2)
        S = jnp.sum(tex, axis=3, keepdims=True)
        Ssq = jnp.sum(tex * tex, axis=3, keepdims=True)
        Sc = jnp.sum(tex * texr, axis=3, keepdims=True)
        Sr = S[:, 0:1]

        def var_of(Ssum, Ssqv):
            tot = jnp.sum(Ssqv, axis=4, keepdims=True)
            msq = jnp.sum(Ssum * Ssum, axis=4, keepdims=True) * inv_s2
            return (tot - msq) * inv_3s2

        var_v = var_of(S, Ssq)
        var_r = var_of(Sr, Ssq[:, 0:1])
        istd_v = jnp.where(var_v <= 0.0, 1.0,
                           jax.lax.rsqrt(jnp.maximum(var_v, 1e-20)))
        istd_r = jnp.where(var_r <= 0.0, 1.0,
                           jax.lax.rsqrt(jnp.maximum(var_r, 1e-20)))
        cov = (jnp.sum(Sc, axis=4, keepdims=True)
               - jnp.sum(Sr * S, axis=4, keepdims=True) * inv_s2) * inv_3s2
        dot = cov * istd_r * istd_v
        x = 1.0 - dot
        incc = x / (1.0 + 3.0 * x)
        out_ref[:] = incc[:, :, :, 0]

    pl.run_scoped(body, tex_ref=pltpu.VMEM((pv * R, 3), f32))


@functools.partial(jax.jit,
                   static_argnames=("ppv", "t", "fan", "s2", "wsize",
                                    "mode"))
def incc_fan_abl(tiles, tilemap, geom, *, ppv, t, fan, s2, wsize, mode):
    bt = tilemap.shape[0]
    b0 = bt // t
    pv = ppv * t
    bpad = (-b0) % ppv
    if bpad:
        tilemap = jnp.concatenate(
            [tilemap, jnp.zeros(bpad * t, tilemap.dtype)])
        geom = jnp.concatenate(
            [geom, jnp.zeros((4, bpad * t * fan * 4), geom.dtype)],
            axis=1)
    b = b0 + bpad
    nsteps = b // ppv
    gs_step = pv * fan * 4
    L = _round_up(gs_step, 128)
    if L != gs_step:
        g3 = geom.reshape(4, nsteps, gs_step)
        g3 = jnp.pad(g3, ((0, 0), (0, 0), (0, L - gs_step)))
        geom = g3.reshape(4, nsteps * L)

    import os
    if os.environ.get("ABL_CONST_IMAP"):
        def tile_spec(j):
            return pl.BlockSpec((1, 1, 1, TILE_PX, 3 * TILE_PX),
                                lambda i, m: (0, 0, 0, 0, 0),
                                memory_space=pltpu.VMEM)
    else:
        def tile_spec(j):
            def imap(i, m):
                c = m[i * pv + j]
                return (c >> 20, (c >> 10) & 0x3FF, c & 0x3FF, 0, 0)
            return pl.BlockSpec((1, 1, 1, TILE_PX, 3 * TILE_PX), imap,
                                memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=[tile_spec(j) for j in range(pv)]
        + [pl.BlockSpec((4, L), lambda i, m: (0, i),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((ppv, t, fan, 1), lambda i, m: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_fan_kernel_abl, ppv=ppv, t=t, fan=fan,
                               s2=s2, wsize=wsize, mode=mode)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, fan, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tilemap, *([tiles] * pv), geom)
    return out[:b0, :, :, 0]


def main():
    N, H, WA = 6, 480, 1280
    rng = np.random.default_rng(0)
    atlas = jnp.asarray(rng.integers(0, 255, (N, H, WA, 3),
                                     dtype=np.uint8))
    tiles = build_tiles(atlas)
    ty, tx = tile_counts(H, WA)
    B, T, FAN = 8192, 6, 4
    v = rng.integers(0, N, B * T)
    tyi = rng.integers(0, ty, B * T)
    txi = rng.integers(0, tx, B * T)
    tilemap = jnp.asarray((v << 20) | (tyi << 10) | txi, jnp.int32)
    R = B * T * FAN * 4
    geom = np.zeros((4, R), np.float32)
    geom[0, 0::4] = 14.0
    geom[1, 0::4] = 14.0
    geom[2, 0::4] = rng.uniform(0, 1, B * T * FAN)
    geom[3, 0::4] = 0.25
    geom[0, 1::4] = 1.0
    geom[1, 2::4] = 1.0
    geom = jnp.asarray(geom)

    evals = B * T * FAN
    import os
    for ppv in (4,):
        for mode in ("full", "dma_only"):
            out = incc_fan_abl(tiles, tilemap, geom, ppv=ppv, t=T,
                               fan=FAN, s2=49, wsize=7, mode=mode)
            float(out.sum())
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                out = incc_fan_abl(tiles, tilemap, geom, ppv=ppv, t=T,
                                   fan=FAN, s2=49, wsize=7, mode=mode)
                float(out.sum())
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"ppv={ppv:2d} {mode:12s} {dt * 1000:7.2f} ms  "
                  f"{evals / dt / 1e6:6.1f} M evals/s")
    if True:
        return
    # tile-locality sensitivity: random vs sorted (coherent scenes) vs
    # one constant tile (pure pipeline overhead floor)
    order = np.lexsort((txi, tyi, v))
    tilemap_sorted = jnp.asarray(
        ((v << 20) | (tyi << 10) | txi)[order], jnp.int32)
    tilemap_const = jnp.zeros(B * T, jnp.int32)
    for tm_name, tm in (("random", tilemap), ("sorted", tilemap_sorted),
                        ("const", tilemap_const)):
        for mode in ("full", "dma_only"):
            out = incc_fan_abl(tiles, tm, geom, ppv=4, t=T, fan=FAN,
                               s2=49, wsize=7, mode=mode)
            float(out.sum())
            ts = []
            for _ in range(6):
                t0 = time.perf_counter()
                out = incc_fan_abl(tiles, tm, geom, ppv=4, t=T, fan=FAN,
                                   s2=49, wsize=7, mode=mode)
                float(out.sum())
                ts.append(time.perf_counter() - t0)
            dt = min(ts)
            print(f"{tm_name:7s} {mode:12s} {dt * 1000:7.2f} ms  "
                  f"{evals / dt / 1e6:6.1f} M evals/s")
    base = None
    for mode in ("full", "no_moments", "wy_only", "dma_only"):
        out = incc_fan_abl(tiles, tilemap, geom, ppv=4, t=T, fan=FAN,
                           s2=49, wsize=7, mode=mode)
        float(out.sum())     # axon: block_until_ready may not block;
        ts = []              # a scalar readback provably synchronizes
        for _ in range(6):
            t0 = time.perf_counter()
            out = incc_fan_abl(tiles, tilemap, geom, ppv=4, t=T, fan=FAN,
                               s2=49, wsize=7, mode=mode)
            float(out.sum())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        if base is None:
            base = dt
        print(f"{mode:12s} {dt * 1000:7.2f} ms  {evals / dt / 1e6:6.1f} "
              f"M evals/s  ({dt / base * 100:5.1f}% of full)")


if __name__ == "__main__":
    main()
