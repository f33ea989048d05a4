"""Sample-major fused fan kernel (v2): the refine hot loop past v1's
formulation ceiling.

Replaces the same reference hot loop as ops/pallas_fan (SURVEY.md 3.4;
reference source/pmvs/optim.cpp:507-578 my_f -> :815-863 grabTex ->
:1031-1088 normalize/dot) but with the data layout turned 90 degrees:

  * v1 put sample rows on SUBLANES and 4 stacked tiles' candidate
    columns on LANES, so every bilinear hat-weight pass materialized a
    [SP*fan*s2p, 128] matrix in which each row used at most 2 of its
    own 32 columns and the other 96 lanes were cross-pair masking
    waste. docs/perf_model.md measured that path at 63% of kernel time
    and derived a ~3x ceiling for the whole formulation.
  * v2 puts the tile's 32 y-rows (resp. x-columns) on SUBLANES and one
    pair's (fan, sample) lattice on LANES: the same weights build at
    [32, fan*s2pL] per pair - no cross-pair lanes, no candidate
    padding - ~4x fewer weight elements, and the y-interpolation is a
    per-pair [3K, K] @ [K, fan*s2pL] matmul against a channel-planar
    transposed tile (`build_tiles2`).
  * Sample positions arrive PRE-EXPANDED from XLA as tile-relative f32
    lane vectors (rel [2, B*T*fan*s2pL]): ~90 MB/call of HBM streaming
    at the bench shape (~0.1 ms) in exchange for deleting the in-kernel
    select-matmul geometry machinery and the int/frac split (positions
    never pass through a bf16 matmul here, so f32 lanes are exact).
  * The kernel emits per-sample interpolated windows tex
    [nsteps, 8, pv*fan*s2pL] (channel rows 0-2); moment algebra and the
    robust INCC run in XLA where the segment reductions fuse into one
    full-bandwidth pass - v1 computed moments in-kernel on a [.., 3]
    layout whose 3/128 lane utilization cost 2.8 ms/call.

Layout rules: s2pL = round_up(round_up(s2, 8), 128 // fan) makes every
pair's lane block SPAIR = fan*s2pL a multiple of 128, so all slices and
scratch writes in the kernel are lane-aligned; fan must divide 128.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_fan import (MAX_SMEM_PAIRS, TILE_PX, TILE_STRIDE,
                         grab_frames, tile_counts)

K = TILE_PX


def s2pl(s2: int, fan: int) -> int:
    """Lane-padded samples per probe: SPAIR = fan * s2pl is a multiple
    of 128 so per-pair lane blocks stay aligned."""
    assert 128 % fan == 0, fan
    s8 = -(-s2 // 8) * 8
    m = 128 // fan
    return -(-s8 // m) * m


def build_tiles2(atlas, dtype=jnp.uint8):
    """Channel-planar transposed tiles for the v2 kernel.

    Returns [N, TY, TX, 3*K, 128] where element [n, ty, tx, c*K + i, y]
    = atlas[n, 12*ty + y, 12*tx + i, c] for y < K and 0 beyond: rows
    are (channel, x-column), columns the tile's y-rows - the LHS the
    per-pair y-interp matmul wants. The minor dim is padded to the
    128-lane HBM tile width ON PURPOSE: a [3K, K]-minor array pads to
    128 lanes in HBM anyway, but then every per-pair block fetch is 96
    strided 32-byte reads - measured 5.6 ms/call of pure DMA at the
    bench shape - while the explicit [3K, 128] layout makes each fetch
    one contiguous burst for the same HBM footprint.
    """
    n, h, wa, _ = atlas.shape
    ty, tx = tile_counts(h, wa)
    ph = (ty - 1) * TILE_STRIDE + K
    pw = (tx - 1) * TILE_STRIDE + K
    a2 = atlas.reshape(n, h, wa * 3)
    a2 = jnp.pad(a2, ((0, 0), (0, ph - h), (0, (pw - wa) * 3)))
    patches = jax.lax.conv_general_dilated_patches(
        a2[:, None].astype(jnp.float32),
        filter_shape=(K, 3 * K),
        window_strides=(TILE_STRIDE, 3 * TILE_STRIDE),
        padding="VALID")
    t1 = patches.reshape(n, K, K, 3, ty, tx)       # [n, y, i, c, ty, tx]
    t2 = jnp.transpose(t1, (0, 4, 5, 3, 2, 1))     # [n, ty, tx, c, i, y]
    t2 = t2.reshape(n, ty, tx, 3 * K, K)
    t2 = jnp.pad(t2, ((0, 0),) * 4 + ((0, 128 - K),))
    return t2.astype(dtype)


def _fan2_kernel(tilemap_ref, *refs, ppv: int, t: int,
                 fan: int, s2pL: int, precise: bool):
    """One grid step = `ppv` patches x `t` views x `fan` probes.

    refs: pv tile refs [1,1,1,3K,128] (planar-transposed,
    build_tiles2; lanes K..127 are zero padding for contiguous DMA),
    rel ref [2, pv*SPAIR] (row 0 = relx, row 1 = rely, tile-relative
    px; invalid/padded lanes pushed to -1000 so every hat weight is
    exactly 0), out ref [1, 3, pv*SPAIR] per-sample interpolated
    windows (one channel row each - a 3-row block halves the output
    write traffic and the moment-tail read traffic vs an 8-row one).

    (A variant that pre-gathered all pair tiles in XLA so each grid
    step is ONE contiguous DMA was measured SLOWER: the XLA row gather
    runs at ~19 GB/s on this chip - 31 ms for the bench shape's 600 MB
    - while the per-pair scalar-prefetch fetches cost ~5.4 ms/call of
    DMA-issue overhead. The DMA-issue cost is the remaining known
    waste; the fix is fewer calls per refinement, not fewer DMAs per
    call.)
    """
    pv = ppv * t
    tile_refs = refs[:pv]
    rel_ref = refs[pv]
    out_ref = refs[pv + 1]
    SPAIR = fan * s2pL
    LTOT = pv * SPAIR
    f32 = jnp.float32

    # candidate index along sublanes: shared by the y rows and the x
    # columns (both span the tile's [0, K) range)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (K, SPAIR), 0).astype(f32)
    foldp = (jax.lax.broadcasted_iota(jnp.int32, (3, 3 * K), 1) // K
             == jax.lax.broadcasted_iota(jnp.int32, (3, 3 * K), 0)
             ).astype(f32)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    def body(q_ref):
        for p in range(pv):
            relx = rel_ref[0:1, p * SPAIR:(p + 1) * SPAIR]   # [1, SPAIR]
            rely = rel_ref[1:2, p * SPAIR:(p + 1) * SPAIR]
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(rely - rowi))
            wx = jnp.maximum(0.0, 1.0 - jnp.abs(relx - rowi))
            tile = tile_refs[p][0, 0, 0][:, :K]              # [3K, K]
            if tile.dtype == jnp.uint8:
                tb = tile.astype(jnp.int32).astype(jnp.bfloat16)
            else:
                tb = tile.astype(jnp.bfloat16)
            if precise:
                # split the hat weights into two bf16-exact halves so
                # the MXU pass recovers ~f32 accuracy (the planar tile
                # is u8-valued and already exact in bf16)
                wy_hi = wy.astype(jnp.bfloat16).astype(f32)
                rows = mm(tb, wy_hi.astype(jnp.bfloat16)) \
                    + mm(tb, (wy - wy_hi).astype(jnp.bfloat16))
            else:
                rows = mm(tb, wy.astype(jnp.bfloat16))       # [3K, SPAIR]
            # x-interp stays elementwise: one [K, SPAIR] weight block
            # multiplied into each channel plane (f32 - no v1-style
            # bf16 store round-off on this leg)
            for c in range(3):
                q_ref[c * K:(c + 1) * K, p * SPAIR:(p + 1) * SPAIR] = \
                    rows[c * K:(c + 1) * K, :] * wx
        # channel fold on the MXU (f32: small M streams at full rate
        # and the 0/1 fold matrix is exact)
        out_ref[0] = mm(foldp, q_ref[:])

    pl.run_scoped(body, q_ref=pltpu.VMEM((3 * K, LTOT), f32))


def _moments_tail(tex, *, b0, t, fan, s2, s2pL):
    """Robust INCC from per-sample windows (XLA side).

    tex: [nsteps, 3, pv*SPAIR] kernel output. The moment algebra
    mirrors v1's in-kernel tail (single-pass sums per (pair, probe),
    reference optim.cpp:1031-1088): padded/invalid lanes carry exact
    zeros so they drop out of every sum; divisors use the true s2.
    Returns incc [b0, t, fan] (unmasked; callers apply validity).
    """
    nsteps = tex.shape[0]
    pv = tex.shape[2] // (fan * s2pL)
    ppv = pv // t
    # keep the channel axis where the kernel wrote it (axis 1): the
    # sample reductions and the ref-view broadcast then fuse into one
    # full-bandwidth pass with NO transpose of the [ns, 3, LTOT] array
    # (an early version transposed 400 MB here at ~2 ms/call)
    tex = tex.reshape(nsteps, 3, ppv, t, fan, s2pL)
    texr = tex[:, :, :, 0:1]                       # ref view
    inv_s2 = 1.0 / s2
    inv_3s2 = 1.0 / (3.0 * s2)
    S = jnp.sum(tex, axis=-1)                      # [ns, 3, ppv, t, f]
    Ssq = jnp.sum(tex * tex, axis=-1)
    Sc = jnp.sum(tex * texr, axis=-1)
    Sr = S[:, :, :, 0:1]

    def var_of(Ssum, Ssqv):
        tot = jnp.sum(Ssqv, axis=1)
        msq = jnp.sum(Ssum * Ssum, axis=1) * inv_s2
        return (tot - msq) * inv_3s2

    var_v = var_of(S, Ssq)                         # [ns, ppv, t, f]
    var_r = var_of(Sr, Ssq[:, :, :, 0:1])          # [ns, ppv, 1, f]
    istd_v = jnp.where(var_v <= 0.0, 1.0,
                       jax.lax.rsqrt(jnp.maximum(var_v, 1e-20)))
    istd_r = jnp.where(var_r <= 0.0, 1.0,
                       jax.lax.rsqrt(jnp.maximum(var_r, 1e-20)))
    cov = (jnp.sum(Sc, axis=1)
           - jnp.sum(Sr * S, axis=1) * inv_s2) * inv_3s2
    dot = cov * istd_r * istd_v                    # [ns, ppv, t, f]
    x = 1.0 - dot
    incc = x / (1.0 + 3.0 * x)
    return incc.reshape(nsteps * ppv, t, fan)[:b0]


def _incc_fan2_call(tiles2, tilemap, rel, *, ppv: int, t: int, fan: int,
                    s2: int, wsize: int, precise: bool):
    """One pallas_call over a pair batch small enough for SMEM."""
    del wsize
    s2L = s2pl(s2, fan)
    SPAIR = fan * s2L
    bt = tilemap.shape[0]
    b0 = bt // t
    pv = ppv * t
    bpad = (-b0) % ppv
    assert (b0 + bpad) * t <= MAX_SMEM_PAIRS + ppv * t, (
        f"incc_fan2 pair batch {(b0 + bpad) * t} exceeds the SMEM "
        f"scalar-prefetch budget {MAX_SMEM_PAIRS}; call incc_fan2 "
        f"(not _incc_fan2_call)")
    if bpad:
        tilemap = jnp.concatenate(
            [tilemap, jnp.zeros(bpad * t, tilemap.dtype)])
        # -1000 keeps every padded lane's hat weights exactly zero
        rel = jnp.concatenate(
            [rel, jnp.full((2, bpad * t * SPAIR), -1000.0, rel.dtype)],
            axis=1)
    b = b0 + bpad
    nsteps = b // ppv
    LTOT = pv * SPAIR

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
        + [pl.BlockSpec((2, LTOT), lambda i, m: (0, i),
                        memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 3, LTOT), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_fan2_kernel, ppv=ppv, t=t, fan=fan,
                               s2pL=s2L, precise=precise)
    tex = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsteps, 3, LTOT), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tilemap, *([tiles2] * pv), rel)
    return _moments_tail(tex, b0=b0, t=t, fan=fan, s2=s2, s2pL=s2L)


@functools.partial(jax.jit,
                   static_argnames=("ppv", "t", "fan", "s2", "wsize",
                                    "precise"))
def incc_fan2(tiles2, tilemap, rel, *, ppv: int, t: int, fan: int,
              s2: int, wsize: int, precise: bool = True):
    """Raw robust INCCs for a [B, T] pair batch at `fan` probes.

    tiles2:  [N, TY, TX, 3K, 128] from build_tiles2
    tilemap: [B*T] int32, bit-packed v << 20 | ty << 10 | tx
    rel:     [2, B*T*fan*s2pl(s2, fan)] f32 tile-relative sample
             positions from fan_geometry2 (row 0 = x, row 1 = y)
    Returns incc [B, T, fan] (unmasked; callers apply validity).

    Batches above MAX_SMEM_PAIRS (patch, view) pairs split along the
    patch axis over a sequential lax.map of one compiled kernel, as in
    v1 (the scalar-prefetch tilemap must fit SMEM).
    """
    s2L = s2pl(s2, fan)
    SPAIR = fan * s2L
    bt = tilemap.shape[0]
    b0 = bt // t
    max_b = max(ppv, (MAX_SMEM_PAIRS // t) // ppv * ppv)
    if b0 <= max_b:
        return _incc_fan2_call(tiles2, tilemap, rel, ppv=ppv, t=t,
                               fan=fan, s2=s2, wsize=wsize,
                               precise=precise)

    nchunk = -(-b0 // max_b)
    bp = nchunk * max_b
    pad_b = bp - b0
    if pad_b:
        tilemap = jnp.concatenate(
            [tilemap, jnp.zeros(pad_b * t, tilemap.dtype)])
        rel = jnp.concatenate(
            [rel, jnp.full((2, pad_b * t * SPAIR), -1000.0, rel.dtype)],
            axis=1)
    tm = tilemap.reshape(nchunk, max_b * t)
    rm = jnp.moveaxis(rel.reshape(2, nchunk, max_b * t * SPAIR), 1, 0)

    def one(args):
        tm_c, rm_c = args
        return _incc_fan2_call(tiles2, tm_c, rm_c, ppv=ppv, t=t,
                               fan=fan, s2=s2, wsize=wsize,
                               precise=precise)

    out = jax.lax.map(one, (tm, rm))          # [nchunk, max_b, t, fan]
    return out.reshape(bp, t, fan)[:b0]


def fan_geometry2(cams, pyr, level: int, wsize: int, views, view_valid,
                  coords_fan, normals_fan):
    """Per-sample grab geometry for the v2 kernel.

    Same frame setup / gates as v1 (pallas_fan.grab_frames), then the
    affine window lattice pos = org + gx*dx2 + gy*dy2 is expanded to
    per-sample tile-relative positions HERE (XLA) instead of inside
    the kernel. Invalid probes and lane-padding samples are pushed to
    -1000 so every hat weight they touch is exactly zero.

    coords_fan/normals_fan: [fan, B, 4].
    Returns (tilemap [B*T] i32 bit-packed, rel [2, B*T*fan*s2pL] f32,
    ok [B, T, fan]).
    """
    fan, b = coords_fan.shape[:2]
    t = views.shape[1]
    tilemap, org, dxf, dyf, okf = grab_frames(
        cams, pyr, level, wsize, views, view_valid, coords_fan,
        normals_fan)
    s2 = wsize * wsize
    s2L = s2pl(s2, fan)
    margin = wsize // 2
    s = jnp.arange(s2L)
    gx = (s % wsize - margin).astype(org.dtype)
    gy = (s // wsize - margin).astype(org.dtype)
    pad_s = s >= s2
    # transpose the SMALL per-pair frames to the kernel's (b, t, fan)
    # order first (~1.6 MB at the bench shape), THEN expand to samples
    # directly in the final layout - expanding first and transposing
    # [fan, b, t, s2L, 2] afterwards made XLA serialize a strided
    # 100 MB transpose into while(dynamic-update-slice) loops costing
    # ~27 ms/wave (xprof, 2026-08-21)
    orgT = jnp.transpose(org, (1, 2, 0, 3))        # [b, t, fan, 2]
    dxT = jnp.transpose(dxf, (1, 2, 0, 3))
    dyT = jnp.transpose(dyf, (1, 2, 0, 3))
    ok = jnp.transpose(okf, (1, 2, 0))             # [b, t, fan]
    bad = pad_s | ~ok[..., None]                   # [b, t, fan, s2L]

    def expand(c):
        r = (orgT[..., None, c] + gx * dxT[..., None, c]
             + gy * dyT[..., None, c])             # [b, t, fan, s2L]
        return jnp.where(bad, -1000.0, r).reshape(-1)

    rel = jnp.stack([expand(0), expand(1)])        # [2, B*T*fan*s2L]
    return tilemap, rel, ok
