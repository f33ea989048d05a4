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

Round-5.5 revision (v2.5): the kernel's XLA boundary moved inward on
both sides, deleting the two largest HBM streams of the v2 design:

  * IN: sample positions are no longer pre-expanded in XLA (the `rel`
    array was ~100 MB/call at the bench shape). The kernel receives
    6 affine-frame scalars per (pair, probe) - org/dx/dy, the same
    numbers the reference's grabTex consumes per window
    (optim.cpp:815-843) - as a [nsteps, 8, L128] block (~4 MB/call)
    and expands pos = org + gx*dx + gy*dy itself: one expansion
    matmul against a constant 0/1 segment matrix broadcasts each
    probe's scalars across its s2pL sample lanes, then two fused
    elementwise passes build relx/rely.
  * OUT: the kernel no longer writes per-sample interpolated windows
    ([nsteps, 3, LTOT] f32, ~150 MB/call, re-read by an XLA moments
    tail measured at ~13 ms/wave). It computes the single-pass moment
    sums (S, S^2, cross-with-ref per channel) in-kernel via
    segment-sum matmuls against the same 0/1 matrix and emits
    [nsteps, 16, 128] (~16 MB/call); the XLA tail shrinks to the
    variance/covariance algebra on those sums.

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
    of 128 so per-pair lane blocks stay aligned.

    Exception: fan == 1 with s2 <= 64 packs TWO pairs per 128-lane
    block (s2pl = 64, SPAIR = 64). A lone probe would otherwise pad 49
    samples to 128 lanes - 2.6x wasted hat-weight compute on the 4
    candidate-only Broyden evaluations of every 8-iteration refinement.
    The kernel handles the sub-128 alignment by processing pairs in
    duos with a block-diagonal y-interp matmul (see _fan2_kernel).
    """
    assert 128 % fan == 0, fan
    s8 = -(-s2 // 8) * 8
    if fan == 1 and s8 <= 64:
        return 64
    m = 128 // fan
    return -(-s8 // m) * m


def _l128(pv: int, fan: int) -> int:
    """Lane-padded frame-scalar count per grid step."""
    return -(-(pv * fan) // 128) * 128


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
                 fan: int, s2: int, s2pL: int, wsize: int, precise: bool):
    """One grid step = `ppv` patches x `t` views x `fan` probes.

    refs: pv tile refs [1,1,1,3K,128] (planar-transposed,
    build_tiles2; lanes K..127 are zero padding for contiguous DMA),
    frames ref [1, 8, L128] (rows 0-5 = orgx orgy dxx dxy dyx dyy per
    (pair, probe) scalar column; invalid probes carry org pushed to
    -10000 so every hat weight is exactly 0), seg ref [L128, LTOT]
    constant 0/1 expansion/segment matrix (seg[j, l] = 1 iff
    l // s2pL == j; fetched once - its index map is constant), out ref
    [1, 16, L128]: rows 0-2 per-channel window sums S_c, rows 3-5 sum
    of squares, rows 6-8 cross-sums with the reference view's window,
    lanes = (pair, probe); rows 9-15 zero.

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
    frames_ref = refs[pv]
    seg_ref = refs[pv + 1]
    out_ref = refs[pv + 2]
    SPAIR = fan * s2pL
    LTOT = pv * SPAIR
    f32 = jnp.float32
    margin = wsize // 2

    # candidate index along sublanes: shared by the y rows and the x
    # columns (both span the tile's [0, K) range)
    rowi = jax.lax.broadcasted_iota(jnp.int32, (K, SPAIR), 0).astype(f32)
    foldp = (jax.lax.broadcasted_iota(jnp.int32, (3, 3 * K), 1) // K
             == jax.lax.broadcasted_iota(jnp.int32, (3, 3 * K), 0)
             ).astype(f32)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    def mmT(a, b):
        # A @ B^T: contract both operands' lane dims (the flash-attn
        # dot shape; keeps the big segment matrix in one layout)
        return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # in-kernel position expansion: broadcast each (pair, probe)'s 6
    # frame scalars across its s2pL sample lanes with one matmul, then
    # build the window lattice rel = org + gx*dx + gy*dy elementwise
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, LTOT), 1)
    sidx = lane % s2pL
    gx = (sidx % wsize - margin).astype(f32)
    gy = (sidx // wsize - margin).astype(f32)
    pad_s = sidx >= s2
    Ef = mm(frames_ref[0, :, :], seg_ref[:, :])      # [8, LTOT]
    relx = Ef[0:1] + gx * Ef[2:3] + gy * Ef[4:5]
    rely = Ef[1:2] + gx * Ef[3:4] + gy * Ef[5:6]
    relx = jnp.where(pad_s, -1000.0, relx)
    rely = jnp.where(pad_s, -1000.0, rely)

    pack2 = SPAIR < 128
    if pack2:
        assert SPAIR == 64 and pv % 2 == 0, (SPAIR, pv)
        # duo lattice: rows 0:K hat against the duo's FIRST pair
        # (lanes 0:64), rows K:2K against its second (lanes 64:128)
        rowi2 = (jax.lax.broadcasted_iota(jnp.int32, (2 * K, 128), 0)
                 % K).astype(f32)
        quad = (jax.lax.broadcasted_iota(jnp.int32, (2 * K, 128), 0) // K
                == jax.lax.broadcasted_iota(jnp.int32, (2 * K, 128), 1)
                // SPAIR).astype(f32)
        rowix = jax.lax.broadcasted_iota(jnp.int32, (K, 128), 0) \
            .astype(f32)

    def _tb(p):
        tile = tile_refs[p][0, 0, 0][:, :K]                  # [3K, K]
        if tile.dtype == jnp.uint8:
            return tile.astype(jnp.int32).astype(jnp.bfloat16)
        return tile.astype(jnp.bfloat16)

    def _interp(tb, wy, wx):
        # y-interp on the MXU, then the elementwise x-weight pass
        # (f32 - no v1-style bf16 store round-off on this leg)
        if precise:
            # split the hat weights into two bf16-exact halves so
            # the MXU pass recovers ~f32 accuracy (the planar tile
            # is u8-valued and already exact in bf16)
            wy_hi = wy.astype(jnp.bfloat16).astype(f32)
            rows = mm(tb, wy_hi.astype(jnp.bfloat16)) \
                + mm(tb, (wy - wy_hi).astype(jnp.bfloat16))
        else:
            rows = mm(tb, wy.astype(jnp.bfloat16))           # [3K, W]
        return [rows[c * K:(c + 1) * K, :] * wx for c in range(3)]

    def body(q_ref, mom_ref):
        if pack2:
            # two pairs per 128-lane block: one block-diagonal
            # [3K, 2K] @ [2K, 128] y-interp per duo (the quad mask
            # zeroes the cross-pair quadrants), halving the hat-weight
            # and x-pass element count vs one 128-lane pair
            for q in range(pv // 2):
                blk = slice(q * 128, (q + 1) * 128)
                rx = relx[0:1, blk]                          # [1, 128]
                ry = rely[0:1, blk]
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - rowi2)) * quad
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - rowix))
                # two summed matmuls realize the block-diagonal
                # y-interp without a lane-concat of the narrow tiles
                # (the quad mask already zeroes each tile's foreign
                # half, so the sum composes, not mixes)
                ta, tb_ = _tb(2 * q), _tb(2 * q + 1)
                wya, wyb = wy[0:K, :], wy[K:2 * K, :]
                if precise:
                    ha = wya.astype(jnp.bfloat16).astype(f32)
                    hb = wyb.astype(jnp.bfloat16).astype(f32)
                    rows = (mm(ta, ha.astype(jnp.bfloat16))
                            + mm(ta, (wya - ha).astype(jnp.bfloat16))
                            + mm(tb_, hb.astype(jnp.bfloat16))
                            + mm(tb_, (wyb - hb).astype(jnp.bfloat16)))
                else:
                    rows = mm(ta, wya.astype(jnp.bfloat16)) \
                        + mm(tb_, wyb.astype(jnp.bfloat16))
                for c in range(3):
                    q_ref[c * K:(c + 1) * K, blk] = \
                        rows[c * K:(c + 1) * K, :] * wx
        else:
            for p in range(pv):
                sl = slice(p * SPAIR, (p + 1) * SPAIR)
                rx = relx[0:1, sl]                           # [1, SPAIR]
                ry = rely[0:1, sl]
                wy = jnp.maximum(0.0, 1.0 - jnp.abs(ry - rowi))
                wx = jnp.maximum(0.0, 1.0 - jnp.abs(rx - rowi))
                for c, plane in enumerate(_interp(_tb(p), wy, wx)):
                    q_ref[c * K:(c + 1) * K, sl] = plane
        # channel fold on the MXU (f32: small M streams at full rate
        # and the 0/1 fold matrix is exact)
        mom_ref[0:3, :] = mm(foldp, q_ref[:])                # tex
        tex = mom_ref[0:3, :]
        mom_ref[3:6, :] = tex * tex
        # cross terms vs the patch's ref-view window, written straight
        # into the stacked moment rows (SPAIR-aligned lane slices)
        for pp in range(ppv):
            base = pp * t * SPAIR
            refw = tex[:, base:base + SPAIR]
            for v in range(t):
                sl = slice(base + v * SPAIR, base + (v + 1) * SPAIR)
                mom_ref[6:9, sl] = tex[:, sl] * refw
        mom_ref[9:16, :] = jnp.zeros((7, LTOT), f32)
        # single-pass moment sums per (pair, probe) segment: ONE
        # [16, LTOT] x seg^T matmul (reference optim.cpp:1031-1088's
        # sums; the variance/covariance algebra runs on these in the
        # XLA tail). Stacking all 9 moment rows into one matmul
        # matters: the MXU streams the seg operand at the same cost
        # for M=16 as for M=3, so three separate matmuls were ~3x the
        # price (measured 3.4 -> ~1.2 ms/call, scripts/ablate_fan25).
        out_ref[0] = mmT(mom_ref[:, :], seg_ref[:, :])

    pl.run_scoped(body,
                  q_ref=pltpu.VMEM((3 * K, LTOT), f32),
                  mom_ref=pltpu.VMEM((16, LTOT), f32))


def _moments_tail2(sums, *, b0, ppv, t, fan, s2):
    """Robust INCC from the kernel's per-(pair, probe) moment sums.

    sums: [nsteps, 16, L128] kernel output (see _fan2_kernel). The
    variance/covariance algebra mirrors the reference normalize/dot
    chain (optim.cpp:1031-1088); padded/invalid lanes carry exact
    zeros so they resolve to the masked-out incc = 0.25 fixpoint;
    divisors use the true s2. Returns incc [b0, t, fan] (unmasked;
    callers apply validity).
    """
    ns = sums.shape[0]
    used = ppv * t * fan
    S = sums[:, 0:3, :used].reshape(ns, 3, ppv, t, fan)
    Sq = sums[:, 3:6, :used].reshape(ns, 3, ppv, t, fan)
    Sc = sums[:, 6:9, :used].reshape(ns, 3, ppv, t, fan)
    inv_s2 = 1.0 / s2
    inv_3s2 = 1.0 / (3.0 * s2)
    Sr = S[:, :, :, 0:1]

    def var_of(Ssum, Ssqv):
        tot = jnp.sum(Ssqv, axis=1)
        msq = jnp.sum(Ssum * Ssum, axis=1) * inv_s2
        return (tot - msq) * inv_3s2

    var_v = var_of(S, Sq)                          # [ns, ppv, t, f]
    var_r = var_of(Sr, Sq[:, :, :, 0:1])           # [ns, ppv, 1, f]
    istd_v = jnp.where(var_v <= 0.0, 1.0,
                       jax.lax.rsqrt(jnp.maximum(var_v, 1e-20)))
    istd_r = jnp.where(var_r <= 0.0, 1.0,
                       jax.lax.rsqrt(jnp.maximum(var_r, 1e-20)))
    cov = (jnp.sum(Sc, axis=1)
           - jnp.sum(Sr * S, axis=1) * inv_s2) * inv_3s2
    dot = cov * istd_r * istd_v                    # [ns, ppv, t, f]
    x = 1.0 - dot
    incc = x / (1.0 + 3.0 * x)
    return incc.reshape(ns * ppv, t, fan)[:b0]


def _incc_fan2_call(tiles2, tilemap, frames, *, ppv: int, t: int,
                    fan: int, s2: int, wsize: int, precise: bool):
    """One pallas_call over a pair batch small enough for SMEM."""
    s2L = s2pl(s2, fan)
    SPAIR = fan * s2L
    bt = tilemap.shape[0]
    b0 = bt // t
    pv = ppv * t
    L128 = _l128(pv, fan)
    bpad = (-b0) % ppv
    assert (b0 + bpad) * t <= MAX_SMEM_PAIRS + ppv * t, (
        f"incc_fan2 pair batch {(b0 + bpad) * t} exceeds the SMEM "
        f"scalar-prefetch budget {MAX_SMEM_PAIRS}; call incc_fan2 "
        f"(not _incc_fan2_call)")
    if bpad:
        tilemap = jnp.concatenate(
            [tilemap, jnp.zeros(bpad * t, tilemap.dtype)])
        frames = jnp.concatenate(
            [frames, jnp.zeros((8, bpad * t * fan), frames.dtype)],
            axis=1)
    b = b0 + bpad
    nsteps = b // ppv
    LTOT = pv * SPAIR

    # [8, b*t*fan] -> [nsteps, 8, L128] per-step blocks (the column
    # order is (patch, view, probe)-major, so each step's pv*fan
    # scalars are contiguous)
    f2 = frames.reshape(8, nsteps, pv * fan)
    f2 = jnp.pad(f2, ((0, 0), (0, 0), (0, L128 - pv * fan)))
    f2 = jnp.moveaxis(f2, 0, 1)

    # constant 0/1 segment matrix: row j covers sample lanes
    # [j*s2pL, (j+1)*s2pL) - the expansion matmul's RHS (transposed)
    # and the segment-sum matmuls' RHS; rows >= pv*fan are zero
    li = jax.lax.broadcasted_iota(jnp.int32, (L128, LTOT), 1)
    ji = jax.lax.broadcasted_iota(jnp.int32, (L128, LTOT), 0)
    seg = (li // s2L == ji).astype(jnp.float32)

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
        out_specs=pl.BlockSpec((1, 16, L128), lambda i, m: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_fan2_kernel, ppv=ppv, t=t, fan=fan,
                               s2=s2, s2pL=s2L, wsize=wsize,
                               precise=precise)
    sums = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nsteps, 16, L128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tilemap, *([tiles2] * pv), f2, seg)
    return _moments_tail2(sums, b0=b0, ppv=ppv, t=t, fan=fan, s2=s2)


@functools.partial(jax.jit,
                   static_argnames=("ppv", "t", "fan", "s2", "wsize",
                                    "precise"))
def incc_fan2(tiles2, tilemap, frames, *, ppv: int, t: int, fan: int,
              s2: int, wsize: int, precise: bool = True):
    """Raw robust INCCs for a [B, T] pair batch at `fan` probes.

    tiles2:  [N, TY, TX, 3K, 128] from build_tiles2
    tilemap: [B*T] int32, bit-packed v << 20 | ty << 10 | tx
    frames:  [8, B*T*fan] f32 affine frame scalars from fan_geometry2
             (rows orgx, orgy, dxx, dxy, dyx, dyy, 0, 0)
    Returns incc [B, T, fan] (unmasked; callers apply validity).

    Batches above MAX_SMEM_PAIRS (patch, view) pairs split along the
    patch axis over a sequential lax.map of one compiled kernel, as in
    v1 (the scalar-prefetch tilemap must fit SMEM).
    """
    bt = tilemap.shape[0]
    b0 = bt // t
    max_b = max(ppv, (MAX_SMEM_PAIRS // t) // ppv * ppv)
    if b0 <= max_b:
        return _incc_fan2_call(tiles2, tilemap, frames, ppv=ppv, t=t,
                               fan=fan, s2=s2, wsize=wsize,
                               precise=precise)

    nchunk = -(-b0 // max_b)
    bp = nchunk * max_b
    pad_b = bp - b0
    if pad_b:
        tilemap = jnp.concatenate(
            [tilemap, jnp.zeros(pad_b * t, tilemap.dtype)])
        frames = jnp.concatenate(
            [frames, jnp.zeros((8, pad_b * t * fan), frames.dtype)],
            axis=1)
    tm = tilemap.reshape(nchunk, max_b * t)
    fm = jnp.moveaxis(frames.reshape(8, nchunk, max_b * t * fan), 1, 0)

    def one(args):
        tm_c, fm_c = args
        return _incc_fan2_call(tiles2, tm_c, fm_c, ppv=ppv, t=t,
                               fan=fan, s2=s2, wsize=wsize,
                               precise=precise)

    out = jax.lax.map(one, (tm, fm))          # [nchunk, max_b, t, fan]
    return out.reshape(bp, t, fan)[:b0]


def fan_geometry2(cams, pyr, level: int, wsize: int, views, view_valid,
                  coords_fan, normals_fan):
    """Per-(pair, probe) affine frame scalars for the v2 kernel.

    Same frame setup / gates as v1 (pallas_fan.grab_frames); the
    per-sample window lattice pos = org + gx*dx2 + gy*dy2 expands
    INSIDE the kernel (v2.5) - this front-end only transposes the
    small per-pair frames to the kernel's (b, t, fan) column order
    (~1.6 MB at the bench shape vs the ~100 MB pre-expanded `rel`
    array of the original v2 design). Invalid probes get org pushed
    to -10000 so every hat weight they produce is exactly zero.

    coords_fan/normals_fan: [fan, B, 4].
    Returns (tilemap [B*T] i32 bit-packed, frames [8, B*T*fan] f32,
    ok [B, T, fan]).
    """
    fan, b = coords_fan.shape[:2]
    t = views.shape[1]
    tilemap, org, dxf, dyf, okf = grab_frames(
        cams, pyr, level, wsize, views, view_valid, coords_fan,
        normals_fan)
    orgT = jnp.transpose(org, (1, 2, 0, 3))        # [b, t, fan, 2]
    dxT = jnp.transpose(dxf, (1, 2, 0, 3))
    dyT = jnp.transpose(dyf, (1, 2, 0, 3))
    ok = jnp.transpose(okf, (1, 2, 0))             # [b, t, fan]
    orgx = jnp.where(ok, orgT[..., 0], -10000.0)
    orgy = jnp.where(ok, orgT[..., 1], -10000.0)
    zero = jnp.zeros_like(orgx)
    frames = jnp.stack([orgx, orgy, dxT[..., 0], dxT[..., 1],
                        dyT[..., 0], dyT[..., 1], zero, zero])
    return tilemap, frames.reshape(8, b * t * fan), ok
