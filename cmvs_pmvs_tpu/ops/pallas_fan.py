"""Fused fan-evaluation Pallas kernel (v1) - superseded as the default
by the sample-major ops/pallas_fan2 kernel in round 5 (2.5x faster at
the bench shape; see docs/perf_model.md). v1 stays as the measured
fallback/ablation baseline (ops/refine.USE_FAN_V2 = False) and still
owns the shared geometry front-end (`grab_frames`, tiles, tilemap).

One Levenberg-Marquardt iteration needs the robust INCC of every
(patch, view) pair at `fan` parameter probes (the candidate step plus 3
forward-difference probes for the residual Jacobian). This kernel fuses
the whole evaluation chain of the reference hot loop (SURVEY.md 3.4,
reference source/pmvs/optim.cpp:507-578 my_f -> :815-863 grabTex ->
:1031-1067 normalize -> :1069-1088 dot) for all fan probes of a pair at
once, against image tiles streamed from HBM by the Pallas pipeline:

  * The pyramid atlas is pre-cut into overlapping 32x32-px tiles with a
    12-px origin stride (`build_tiles`), sized so that any level-adapted
    wsize<=9 sample window - extent <= (wsize-1)*(|dx|+|dy|) + 2 <= 20 px
    after footprint level selection - fits entirely inside ONE tile.
    Tiles are uint8 (the reference pyramid is byte-valued,
    image.cpp:317-320, so this is lossless) and fetched per (patch, view)
    pair through PrefetchScalarGridSpec index maps: a streaming DMA at
    full HBM bandwidth instead of XLA's per-index gather (measured ~25x
    faster at this batch shape).
  * Sample positions are affine in the window lattice:
    pos = c2 + gx*dx2 + gy*dy2, so the kernel receives only 6 numbers per
    (pair, fan) and builds all positions itself - as one select-matmul
    per 4-pair stack whose constant left operand carries the (1, gx, gy)
    lattice. Geometry arrives split into integer and fractional lanes:
    both halves are exactly representable in the MXU's bf16 passes, so
    positions survive DEFAULT-precision matmuls to ~0.004 px.
  * Bilinear interpolation runs as matmuls with 4-pair block-diagonal
    stacking so every MXU pass has a full 128-deep contraction.
  * Normalization and NCC use single-pass moment algebra (sum, sum of
    squares, cross sum per fan segment) - no second sweep over samples.

Output is the raw robust INCC per (patch, view, fan); validity masking
stays in XLA where the gates (angle cone, grabSafe margins, min-image
counts) are computed.

Performance model (measured on v5e): the kernel is bound by VMEM
traffic through the per-stack intermediates (wy [896, 128], wx3/rows/q
[896, 96] f32), NOT by MXU passes, DMA count, or tile dtype - halving
matmul passes (WY_SPLIT=False), pinning all fetches to one tile, and
u8-vs-f32 tiles all leave the runtime within noise. Next headroom is a
bf16 intermediate mode with per-row integer re-centering of the rel
coordinates (bf16 positions alone would bias windows by up to 0.06 px).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PX = 32       # tile extent in px (y rows; x = 96 interleaved lanes)
TILE_STRIDE = 12   # tile origin stride in px (both axes)

SP = 4             # pairs per stacked matmul (contraction = SP*32 = 128)

# Scalar-prefetch budget: the per-call tilemap lives in SMEM (4 B per
# (patch, view) pair) and the chip has only 1 MiB of SMEM total. Above
# this many pairs incc_fan splits the batch over a sequential lax.map of
# per-chunk pallas calls (one Mosaic kernel, compiled once). 64Ki pairs
# = 256 KiB leaves ample headroom for Mosaic's own SMEM use; round 3's
# full-scene seed commit (~1.04M pairs) failed AOT compile without this
# ("Allocation (size=4149248) would exceed memory (size=1048576) ...
# space=smem, tag='prefetched SMEM operand'").
MAX_SMEM_PAIRS = 64 * 1024


def tile_counts(h: int, wa: int) -> tuple[int, int]:
    """(TY, TX) tile-grid dims covering an [h, wa]-px atlas."""
    ty = max(1, -(-(h - TILE_PX) // TILE_STRIDE) + 1)
    tx = max(1, -(-(wa - TILE_PX) // TILE_STRIDE) + 1)
    return ty, tx


def build_tiles(atlas, dtype=jnp.uint8):
    """Pre-cut the [N, H, WA, 3] atlas into overlapping tiles.

    Returns [N, TY, TX, TILE_PX, 3*TILE_PX] with channel-interleaved
    lanes, tile (ty, tx) anchored at pixel (12*ty, 12*tx). Runs as one
    XLA program (conv_general_dilated_patches).
    """
    n, h, wa, _ = atlas.shape
    ty, tx = tile_counts(h, wa)
    ph = (ty - 1) * TILE_STRIDE + TILE_PX
    pw = (tx - 1) * TILE_STRIDE + TILE_PX
    a2 = atlas.reshape(n, h, wa * 3)
    a2 = jnp.pad(a2, ((0, 0), (0, ph - h), (0, (pw - wa) * 3)))
    patches = jax.lax.conv_general_dilated_patches(
        a2[:, None].astype(jnp.float32),
        filter_shape=(TILE_PX, 3 * TILE_PX),
        window_strides=(TILE_STRIDE, 3 * TILE_STRIDE),
        padding="VALID")
    tiles = patches.reshape(n, TILE_PX, 3 * TILE_PX, ty, tx)
    tiles = jnp.transpose(tiles, (0, 3, 4, 1, 2))
    return tiles.astype(dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _fan_kernel(tilemap_ref, *refs, ppv: int, t: int, fan: int, s2: int,
                wsize: int, precise: bool):
    """One grid step = `ppv` patches x `t` views x `fan` probes.

    refs: PV tile refs [1,1,1,K,3K], geom ref [4, L] (component-major:
    row c holds component c - x_int, y_int, x_frac, y_frac - of every
    (pair, fan, gline) geometry line, glines being (origin, dx2, dy2,
    pad); this layout keeps the HBM array compact, where a line-major
    [R, 4] array would be lane-padded 32x by the (8, 128) tiling), out
    ref [ppv, t, fan, 1]. Window rows are laid out (pair, fan, sample)
    with the sample dim padded to s2p (multiple of 8); padded sample
    rows are masked out of the x weights.
    """
    pv = ppv * t
    tile_refs = refs[:pv]
    geom_ref = refs[pv]
    out_ref = refs[pv + 1]
    K = TILE_PX
    s2p = _round_up(s2, 8)
    R = fan * s2p                       # rows per pair
    SR = SP * R                         # rows per stack
    nstack = pv // SP
    GS = SP * fan * 4                   # geometry rows per stack
    margin = wsize // 2
    f32 = jnp.float32

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=f32)

    # ---- hoisted constants ----
    rs1 = jax.lax.broadcasted_iota(jnp.int32, (SR, 1), 0)
    s_idx = rs1 % s2p
    pad_row = s_idx >= s2
    gx = (s_idx % wsize - margin).astype(f32)                # [SR, 1]
    gy = (s_idx // wsize - margin).astype(f32)
    pfl = rs1 // s2p                                         # [SR, 1]
    # select-matmul constant: SELG[r, pfl*4 + q] = (1, gx, gy, 0)[q]
    gcol = jax.lax.broadcasted_iota(jnp.int32, (SR, GS), 1)
    sel = (gcol // 4 == pfl).astype(f32)
    u = jnp.where(gcol % 4 == 0, 1.0,
                  jnp.where(gcol % 4 == 1, gx,
                            jnp.where(gcol % 4 == 2, gy, 0.0)))
    selg = sel * u                                           # [SR, GS]

    rsw = jax.lax.broadcasted_iota(jnp.int32, (SR, SP * K), 0)
    lsw = jax.lax.broadcasted_iota(jnp.int32, (SR, SP * K), 1)
    # masks folded INTO the column constants: a lane outside the row's
    # stack segment (or a padded sample row) sees a column coordinate
    # pushed 1e9 away, so the hat weight evaluates to exactly 0 without
    # a separate mask multiply over the [SR, 128]/[SR, 96] tiles (the
    # elementwise weight passes are ~40% of kernel compute)
    stackmask = (lsw // K == rsw // R)                       # [SR, SP*K]
    colk = jnp.where(stackmask, (lsw % K).astype(f32), 1e9)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (SR, 3 * K), 1)
    colx3 = jnp.where(pad_row, 1e9, (col3 // 3).astype(f32))
    fold = (jax.lax.broadcasted_iota(jnp.int32, (3 * K, 8), 0) % 3
            == jax.lax.broadcasted_iota(jnp.int32, (3 * K, 8), 1)
            ).astype(f32)                                    # cols 3..7 = 0
    def body(tex_ref):
        for s in range(nstack):
            gT = geom_ref[:, pl.ds(s * GS, GS)]              # [4, GS]
            relq = jax.lax.dot_general(
                selg, gT, (((1,), (1,)), ((), ())),
                preferred_element_type=f32)                  # [SR, 4]
            relx = relq[:, 0:1] + relq[:, 2:3]
            rely = relq[:, 1:2] + relq[:, 3:4]
            regs = [tile_refs[s * SP + j][0, 0, 0] for j in range(SP)]
            regstack = jnp.concatenate(regs, axis=0)         # [SP*K, 3K]
            if regstack.dtype == jnp.uint8:
                regstack = regstack.astype(jnp.int32).astype(f32)
            else:
                regstack = regstack.astype(f32)
            wx3 = jnp.maximum(0.0, 1.0 - jnp.abs(relx - colx3))
            wy = jnp.maximum(0.0, 1.0 - jnp.abs(rely - colk))
            if precise:
                # split the fractional hat weights into two halves that
                # are each exact in the MXU's bf16 pass (regstack is
                # uint8-valued and therefore already exact); the sum
                # recovers ~f32 accuracy at 2x DEFAULT cost vs HIGH's 3x
                wy_hi = wy.astype(jnp.bfloat16).astype(f32)
                rows = mm(wy_hi, regstack) + mm(wy - wy_hi, regstack)
                q = rows * wx3                               # [SR, 3K]
                # channel fold on the MXU, also hi/lo split (the fold
                # matrix is 0/1 = bf16-exact) - VPU lane reductions here
                # were the kernel's dominant cost
                q_hi = q.astype(jnp.bfloat16).astype(f32)
                tex8 = mm(q_hi, fold) + mm(q - q_hi, fold)   # [SR, 8]
            else:
                # fast mode for LM probe evaluations: weights computed
                # in f32 registers but STORED bf16, single MXU passes.
                # Window noise ~0.4% - measured to leave LM convergence
                # unchanged (the VMEM traffic of these intermediates is
                # the kernel's bound).
                # Negative result (measured 2026-08, this chip): running
                # the hat-weight arithmetic natively in bf16 via integer
                # re-centering (floor(pos) exact, fractional remainder
                # <= 2^-9 px) REGRESSED the kernel 30.1k -> 25.5k
                # refinements/s - the VPU widens bf16 elementwise ops to
                # f32 lanes, so "half-width" weights add pack/unpack work
                # without saving compute; only the MXU inputs benefit
                # from bf16, which this variant already provides.
                wy_bf = wy.astype(jnp.bfloat16)
                rows = mm(wy_bf, regstack.astype(jnp.bfloat16))
                q = (rows * wx3).astype(jnp.bfloat16)        # [SR, 3K]
                tex8 = mm(q, fold.astype(jnp.bfloat16))      # [SR, 8]
            tex_ref[pl.ds(s * SR, SR), :] = tex8[:, :3]

        # ---- single-pass moments per (pair, fan) segment ----
        tex = tex_ref[:].reshape(ppv, t, fan, s2p, 3)
        texr = tex[:, 0:1]                                   # ref view
        inv_s2 = 1.0 / s2
        inv_3s2 = 1.0 / (3.0 * s2)
        S = jnp.sum(tex, axis=3, keepdims=True)              # [p,t,f,1,3]
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
        dot = cov * istd_r * istd_v                          # [p,t,f,1,1]
        x = 1.0 - dot
        incc = x / (1.0 + 3.0 * x)
        out_ref[:] = incc[:, :, :, 0]                        # [p,t,f,1]

    pl.run_scoped(body, tex_ref=pltpu.VMEM((pv * R, 3), f32))


@functools.partial(jax.jit,
                   static_argnames=("ppv", "t", "fan", "s2", "wsize",
                                    "precise"))
def incc_fan(tiles, tilemap, geom, *, ppv: int, t: int, fan: int, s2: int,
             wsize: int, precise: bool = True):
    """Raw robust INCCs for a [B, T] pair batch at `fan` probes.

    tiles:   [N, TY, TX, K, 3K] from build_tiles
    tilemap: [B*T] int32, bit-packed v << 20 | ty << 10 | tx
    geom:    [4, B*T*fan*4] f32, component-major: row c holds component
             c - (x_int, y_int, x_frac, y_frac) - of the (origin, dx2,
             dy2, pad) geometry lines of every (pair, fan), in
             tile-relative pixel coordinates. (Component-major keeps
             the HBM layout compact; a line-major [R, 4] array is
             lane-padded 32x by the TPU's (8, 128) tiling - 8 GB of
             padding at full-scene seed batches.)
    Returns incc [B, T, fan] (unmasked; callers apply validity).

    Batches of any size are accepted: above MAX_SMEM_PAIRS (patch, view)
    pairs the batch is split along the patch axis into chunks whose
    scalar-prefetch tilemap fits SMEM, run through one sequential
    lax.map over a single compiled kernel instance.
    """
    bt = tilemap.shape[0]
    b0 = bt // t
    max_b = max(ppv, (MAX_SMEM_PAIRS // t) // ppv * ppv)
    if b0 <= max_b:
        return _incc_fan_call(tiles, tilemap, geom, ppv=ppv, t=t, fan=fan,
                              s2=s2, wsize=wsize, precise=precise)

    nchunk = -(-b0 // max_b)
    bp = nchunk * max_b
    pad_b = bp - b0
    if pad_b:
        tilemap = jnp.concatenate(
            [tilemap, jnp.zeros(pad_b * t, tilemap.dtype)])
        geom = jnp.concatenate(
            [geom, jnp.zeros((4, pad_b * t * fan * 4), geom.dtype)],
            axis=1)
    tm = tilemap.reshape(nchunk, max_b * t)
    gm = jnp.moveaxis(
        geom.reshape(4, nchunk, max_b * t * fan * 4), 1, 0)

    def one(args):
        tm_c, gm_c = args
        return _incc_fan_call(tiles, tm_c, gm_c, ppv=ppv, t=t, fan=fan,
                              s2=s2, wsize=wsize, precise=precise)

    out = jax.lax.map(one, (tm, gm))          # [nchunk, max_b, t, fan]
    return out.reshape(bp, t, fan)[:b0]


def _incc_fan_call(tiles, tilemap, geom, *, ppv: int, t: int, fan: int,
                   s2: int, wsize: int, precise: bool):
    """One pallas_call over a pair batch small enough for SMEM."""
    bt = tilemap.shape[0]
    b0 = bt // t
    pv = ppv * t
    assert pv % SP == 0, pv
    bpad = (-b0) % ppv
    # fail loudly if a caller bypasses the chunked wrapper with a batch
    # whose prefetched tilemap would blow past the SMEM budget (the
    # chip has 1 MiB total; MAX_SMEM_PAIRS leaves Mosaic headroom).
    # Slack of ppv*t covers the wrapper's own ppv rounding.
    assert (b0 + bpad) * t <= MAX_SMEM_PAIRS + ppv * t, (
        f"incc_fan pair batch {(b0 + bpad) * t} exceeds the SMEM "
        f"scalar-prefetch budget {MAX_SMEM_PAIRS}; call incc_fan "
        f"(not _incc_fan_call)")
    if bpad:
        tilemap = jnp.concatenate(
            [tilemap, jnp.zeros(bpad * t, tilemap.dtype)])
        geom = jnp.concatenate(
            [geom, jnp.zeros((4, bpad * t * fan * 4), geom.dtype)],
            axis=1)
    b = b0 + bpad
    nsteps = b // ppv
    # per-step lane-padded geometry: [4, nsteps * L] so each grid step's
    # block is a 128-aligned lane slice regardless of t and fan
    gs_step = pv * fan * 4
    L = _round_up(gs_step, 128)
    if L != gs_step:
        g3 = geom.reshape(4, nsteps, gs_step)
        g3 = jnp.pad(g3, ((0, 0), (0, 0), (0, L - gs_step)))
        geom = g3.reshape(4, nsteps * L)

    # tilemap is bit-packed (v << 20 | ty << 10 | tx): the per-step
    # index maps run on the sparse/scalar core for every tile fetch, and
    # shift/mask unpacking is several times cheaper there than the
    # div/mod of a mixed-radix code - the kernel is DMA-issue bound
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
    kernel = functools.partial(_fan_kernel, ppv=ppv, t=t, fan=fan, s2=s2,
                               wsize=wsize, precise=precise)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, t, fan, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(tilemap, *([tiles] * pv), geom)
    return out[:b0, :, :, 0]


def grab_frames(cams, pyr, level: int, wsize: int, views, view_valid,
                coords_fan, normals_fan):
    """XLA-side grab geometry for all fan probes of a pair batch.

    Mirrors grabTex's frame setup (reference optim.cpp:815-843 + grabSafe
    :783-805): projected tangent frame, footprint level selection (from
    probe 0 - probes move sub-pixel so the octave cannot flip), margin-3
    boundary gate, and the enclosing tile per pair.

    coords_fan/normals_fan: [fan, B, 4].
    Returns (tilemap [B*T] i32, org/dxf/dyf [fan, B, T, 2] tile-relative
    px, okf [fan, B, T]) - the shared core of the v1 (fan_geometry) and
    v2 (pallas_fan2.fan_geometry2) kernel front-ends.
    """
    from ..geom.cameras import project
    from .refine import _patch_axes

    fan, b = coords_fan.shape[:2]
    t = views.shape[1]
    vid = jnp.maximum(views, 0)
    margin = wsize // 2
    ref = jnp.maximum(views[:, 0], 0)

    # one batched frame computation over fan*B rows
    cf = coords_fan.reshape(fan * b, 4)
    nf = normals_fan.reshape(fan * b, 4)
    reff = jnp.tile(ref, fan)
    pxf, pyf = _patch_axes(cams, level, reff, cf, nf)
    P = cams.P[vid]                                           # [B,T,3,4]
    ctr = cams.center[vid]                                    # [B,T,4]

    def proj_all(pts):
        # pts [fan*b, 4] -> [fan, b, t, 3] level-space projections
        q = jnp.einsum("btik,fbk->fbti", P,
                       pts.reshape(fan, b, 4))
        zs = q[..., 2]
        bad = zs <= 0.0
        zsafe = jnp.where(bad, 1.0, zs)
        xy = q[..., :2] / (zsafe[..., None] * (2.0 ** level))
        xy = jnp.where(bad[..., None], -0xFFFF, xy)
        return xy, bad

    c2f, zbad = proj_all(cf)
    dxf, _ = proj_all(cf + pxf)
    dyf, _ = proj_all(cf + pyf)
    dxf = dxf - c2f
    dyf = dyf - c2f

    rayf = ctr[None] - cf.reshape(fan, b, 4)[:, :, None, :]
    rayf = rayf / jnp.linalg.norm(rayf[..., :3], axis=-1, keepdims=True)
    wgt = jnp.einsum("fbtk,fbk->fbt", rayf[..., :3],
                     nf.reshape(fan, b, 4)[..., :3])
    okf = view_valid[None] & (wgt >= 0.5) & ~zbad             # cos 60deg

    # level from probe 0 (optim.cpp:831-843)
    ratio = (jnp.linalg.norm(dxf[0], axis=-1)
             + jnp.linalg.norm(dyf[0], axis=-1)) / 2.0
    safe_ratio = jnp.where(ratio > 0.0, ratio, 1.0)
    leveldif = jnp.clip(
        jnp.floor(jnp.log2(safe_ratio) + 0.5).astype(jnp.int32),
        -level, 2)
    newlevel = jnp.clip(level + leveldif, 0, pyr.num_levels - 1)
    scale = (2.0 ** (newlevel - level)).astype(c2f.dtype)[None, ..., None]

    c2f = c2f / scale
    dxf = dxf / scale
    dyf = dyf / scale

    # grabSafe margin-3 gate per probe
    span = (jnp.abs(dxf) + jnp.abs(dyf)) * margin
    w = pyr.widths[newlevel, vid].astype(c2f.dtype)[None]
    h = pyr.heights[newlevel, vid].astype(c2f.dtype)[None]
    m2 = 3.0
    mn = c2f - span
    mx = c2f + span
    okf = okf & ((mn[..., 0] >= m2) & (mn[..., 1] >= m2)
                 & (mx[..., 0] < w - 1 - m2) & (mx[..., 1] < h - 1 - m2))
    # tile-budget gate: the whole window (extent 2*span + 2 px incl. the
    # bilinear +1 halo) must fit one TILE_PX tile whose origin can sit up
    # to TILE_STRIDE-1 px left of the window start. The leveldif clamp at
    # +2 (optim.cpp:831-843) lets anisotropic / cross-scale footprints
    # exceed that; such windows would sample zero hat weights and corrupt
    # the pair's INCC silently, so gate them invalid instead (they fall
    # back to the reference's grab-failure score-2.0 path).
    budget = (TILE_PX - TILE_STRIDE - 1) / 2.0 - 1.0
    okf = okf & (span[..., 0] <= budget) & (span[..., 1] <= budget)

    # enclosing tile from probe 0 (x in atlas coordinates)
    ty_n, tx_n = tile_counts(int(pyr.atlas.shape[1]),
                             int(pyr.atlas.shape[2]))
    x0 = pyr.xoff[newlevel].astype(c2f.dtype)
    minx = c2f[0, ..., 0] + x0 - span[0, ..., 0] - 1.0
    miny = c2f[0, ..., 1] - span[0, ..., 1] - 1.0
    txi = jnp.clip((jnp.maximum(minx, 0.0) // TILE_STRIDE).astype(
        jnp.int32), 0, tx_n - 1)
    tyi = jnp.clip((jnp.maximum(miny, 0.0) // TILE_STRIDE).astype(
        jnp.int32), 0, ty_n - 1)
    orgx = (txi * TILE_STRIDE).astype(c2f.dtype) - x0
    orgy = (tyi * TILE_STRIDE).astype(c2f.dtype)

    # bit-packed for cheap scalar-core unpacking in the kernel's index
    # maps; 10 bits per tile axis covers atlases up to ~4000 px wide and
    # 11 bits above bit 20 cap the view axis (vid << 20 must not reach
    # the int32 sign bit)
    assert ty_n < 1024 and tx_n < 1024, (ty_n, tx_n)
    assert int(pyr.atlas.shape[0]) < 2048, pyr.atlas.shape[0]
    tilemap = ((vid << 20) | (tyi << 10) | txi).reshape(b * t)
    org = jnp.stack([c2f[..., 0] - orgx[None], c2f[..., 1] - orgy[None]],
                    -1)                                       # [fan,b,t,2]
    org = jnp.where(okf[..., None], org, 0.0)
    dxf = jnp.where(okf[..., None], dxf, 0.0)
    dyf = jnp.where(okf[..., None], dyf, 0.0)
    return tilemap.astype(jnp.int32), org, dxf, dyf, okf


def fan_geometry(cams, pyr, level: int, wsize: int, views, view_valid,
                 coords_fan, normals_fan):
    """v1 kernel front-end: component-major int/frac geometry lines.

    coords_fan/normals_fan: [fan, B, 4].
    Returns (tilemap [B*T] i32, geom [4, B*T*fan*4] f32, ok [B, T, fan]).
    """
    fan, b = coords_fan.shape[:2]
    t = views.shape[1]
    tilemap, org, dxf, dyf, okf = grab_frames(
        cams, pyr, level, wsize, views, view_valid, coords_fan,
        normals_fan)
    # lines (origin, dx2, dy2, pad) -> [fan, b, t, 4, 2]
    rows = jnp.stack([org, dxf, dyf, jnp.zeros_like(org)], 3)
    ri = jnp.floor(rows)
    geom = jnp.concatenate([ri, rows - ri], -1)               # [..., 4]
    # component-major [4, B*T*fan*4] with (fan, line) minor in the
    # column order - the compact HBM layout incc_fan expects
    geom = jnp.transpose(geom, (4, 1, 2, 0, 3)).reshape(
        4, b * t * fan * 4)
    ok = jnp.transpose(okf, (1, 2, 0))                        # [B, T, fan]
    return tilemap, geom, ok
