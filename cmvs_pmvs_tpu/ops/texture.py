"""Batched patch texture grabbing and NCC scoring.

TPU-first port of the reference hot loop (SURVEY.md section 3.4): for a
batch of patches and up to tau views each, project the patch tangent frame,
pick a pyramid level from the projected footprint, gather a wsize x wsize
bilinear window, normalize to zero-mean/unit-variance and correlate
(reference source/pmvs/optim.cpp:783-863 grabTex, :1031-1067 normalize,
:1069-1088 dot).

Everything is expressed over [B, T] batches with validity masks instead of
per-patch early-outs; failed grabs produce valid=False, which downstream
score aggregation maps to the reference's empty-texture semantics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geom.cameras import CameraSet, project
from ..image.pyramid import PyramidSet
from ..image.sample import bicubic_color, bilinear_color

# Subpixel sampling mode: "bilinear" (reference default) or "bicubic"
# (the reference's compile-time FURUKAWA_IMAGE_BICUBIC variant,
# image.hpp:282-433). Bicubic routes grabs through the per-sample XLA
# gather path - the fused TPU kernels are bilinear-only, matching the
# reference's default build.
SAMPLING = "bilinear"


def robustincc(x):
    """x / (1 + 3x) (reference include/pmvs/optim.hpp:86-88)."""
    return x / (1.0 + 3.0 * x)


def unrobustincc(x):
    """Inverse: x / (1 - 3x) (reference optim.hpp:90-92)."""
    return x / (1.0 - 3.0 * x)


def _grab_frame(cams: CameraSet, pyr: PyramidSet, level: int, wsize: int,
                coord, pxaxis, pyaxis, pzaxis, views, view_valid,
                angle_threshold):
    """Shared geometry of grabTex: projected frame, adaptive level,
    grabSafe gate. Returns (c2, dx2, dy2, newlevel, vid, ok)."""
    b, t = views.shape
    vid = jnp.maximum(views, 0)
    margin = wsize // 2

    # angle gate: ray to optical center vs patch normal (optim.cpp:818-823)
    ray = cams.center[vid] - coord[:, None, :]               # [B, T, 4]
    ray = ray / jnp.linalg.norm(ray[..., :3], axis=-1, keepdims=True)
    weight = jnp.einsum("btk,bk->bt", ray[..., :3], pzaxis[:, :3])
    ok = view_valid & (weight >= jnp.cos(angle_threshold))

    # project the frame (optim.cpp:827-829)
    P = cams.P[vid]                                          # [B, T, 3, 4]
    center2 = project(P, coord[:, None, :], level)
    dx = project(P, (coord + pxaxis)[:, None, :], level) - center2
    dy = project(P, (coord + pyaxis)[:, None, :], level) - center2

    # footprint level selection (optim.cpp:831-843)
    ratio = (jnp.linalg.norm(dx[..., :2], axis=-1)
             + jnp.linalg.norm(dy[..., :2], axis=-1)) / 2.0
    safe_ratio = jnp.where(ratio > 0.0, ratio, 1.0)
    leveldif = jnp.floor(jnp.log2(safe_ratio) + 0.5).astype(jnp.int32)
    leveldif = jnp.clip(leveldif, -level, 2)
    newlevel = level + leveldif
    # also stay within the allocated pyramid (reference allocates level+3)
    newlevel = jnp.clip(newlevel, 0, pyr.num_levels - 1)
    scale = (2.0 ** (newlevel - level)).astype(center2.dtype)[..., None]

    c2 = center2[..., :2] / scale
    dx2 = dx[..., :2] / scale
    dy2 = dy[..., :2] / scale

    # grabSafe margin check (optim.cpp:783-805, margin2 = 3)
    span = (jnp.abs(dx2) + jnp.abs(dy2)) * margin
    minxy = c2 - span
    maxxy = c2 + span
    w = pyr.widths[newlevel, vid].astype(c2.dtype)
    h = pyr.heights[newlevel, vid].astype(c2.dtype)
    margin2 = 3.0
    safe = ((minxy[..., 0] >= margin2) & (minxy[..., 1] >= margin2)
            & (maxxy[..., 0] < w - 1 - margin2)
            & (maxxy[..., 1] < h - 1 - margin2))
    ok = ok & safe
    return c2, dx2, dy2, newlevel, vid, ok


def _sample_positions(c2, dx2, dy2, ok, wsize: int):
    """[B, T, S2, 2] level-space sample positions (optim.cpp:846-862)."""
    margin = wsize // 2
    offs = jnp.arange(wsize, dtype=c2.dtype) - margin
    gy, gx = jnp.meshgrid(offs, offs, indexing="ij")
    gx = gx.reshape(-1)   # [S2]
    gy = gy.reshape(-1)
    pos = (c2[:, :, None, :]
           + gx[None, None, :, None] * dx2[:, :, None, :]
           + gy[None, None, :, None] * dy2[:, :, None, :])
    # clamp positions for invalid pairs so gathers stay in range
    return jnp.where(ok[..., None, None], pos, 3.0)


def grab_tex(cams: CameraSet, pyr: PyramidSet, level: int, wsize: int,
             coord, pxaxis, pyaxis, pzaxis, views, view_valid,
             angle_threshold: float = jnp.pi / 3.0):
    """Grab wsize^2 RGB windows for a [B, T] batch of (patch, view) pairs.

    coord/pxaxis/pyaxis/pzaxis: [B, 4]; views: [B, T] int32 (clamped >= 0
    for gathers); view_valid: [B, T] bool.

    Returns (texs [B, T, wsize*wsize, 3] float, valid [B, T] bool).
    Matches reference COptim::grabTex (optim.cpp:815-863): view-angle gate,
    footprint-adaptive pyramid level (leveldif in [-level, 2],
    optim.cpp:831-843), grabSafe margin-3 boundary check (optim.cpp:783-805).
    """
    c2, dx2, dy2, newlevel, vid, ok = _grab_frame(
        cams, pyr, level, wsize, coord, pxaxis, pyaxis, pzaxis, views,
        view_valid, angle_threshold)
    pos = _sample_positions(c2, dx2, dy2, ok, wsize)

    if SAMPLING == "bicubic":
        nl = jnp.broadcast_to(newlevel[..., None], pos.shape[:-1])
        nv = jnp.broadcast_to(vid[..., None], pos.shape[:-1])
        texs = bicubic_color(pyr, nv, nl, pos[..., 0], pos[..., 1])
    elif _USE_BLOCK_SAMPLING:
        texs = _block_bilinear(pyr, vid, newlevel, pos, ok)
    else:
        nl = jnp.broadcast_to(newlevel[..., None], pos.shape[:-1])
        nv = jnp.broadcast_to(vid[..., None], pos.shape[:-1])
        texs = bilinear_color(pyr, nv, nl, pos[..., 0], pos[..., 1])
    return texs, ok


def grab_block_plan(cams: CameraSet, pyr: PyramidSet, level: int,
                    wsize: int, coord, pxaxis, pyaxis, pzaxis, views,
                    view_valid, k: int,
                    angle_threshold: float = jnp.pi / 3.0):
    """Freeze block origins + per-view pyramid levels at the current
    patch state, with a movement budget: K covers the sample span plus
    ~(K-span)/2 px of drift, so several Gauss-Newton iterations can
    re-sample from the same fetched blocks before a refetch.

    Returns plan dict {starts [B*T, 3] int32, newlevel [B, T],
    origin [B, T, 2] level-space}.
    """
    c2, dx2, dy2, newlevel, vid, ok = _grab_frame(
        cams, pyr, level, wsize, coord, pxaxis, pyaxis, pzaxis, views,
        view_valid, angle_threshold)
    pos = _sample_positions(c2, dx2, dy2, ok, wsize)
    b, t = views.shape
    pmin = pos.min(axis=2)
    pmax = pos.max(axis=2)
    center = (pmin + pmax) / 2.0
    start = jnp.floor(center - k / 2.0).astype(jnp.int32)
    x0 = pyr.xoff[newlevel]
    lvl_w = pyr.widths[newlevel, vid]
    lvl_h = pyr.heights[newlevel, vid]
    sx = jnp.clip(start[..., 0], 0, jnp.maximum(lvl_w - k, 0))
    sy = jnp.clip(start[..., 1], 0, jnp.maximum(lvl_h - k, 0))
    starts = jnp.stack([vid, sy, sx + x0], -1).reshape(b * t, 3)
    return {"starts": starts.astype(jnp.int32), "newlevel": newlevel,
            "origin": jnp.stack([sx, sy], -1)}


def grab_block_rel(cams: CameraSet, pyr: PyramidSet, level: int,
                   wsize: int, plan, coord, pxaxis, pyaxis, pzaxis,
                   views, view_valid, k: int,
                   angle_threshold: float = jnp.pi / 3.0):
    """Sample positions of the *current* patch state relative to the
    frozen block plan. Projection/axes/gates are exact; only the pyramid
    level is frozen to the plan's (it changes by whole octaves and
    rarely mid-refinement). Positions are clamped to the block interior,
    bounding drift error until the next refetch.

    Returns (relx [B*T, S2], rely [B*T, S2], ok [B, T])."""
    b, t = views.shape
    vid = jnp.maximum(views, 0)
    margin = wsize // 2

    ray = cams.center[vid] - coord[:, None, :]
    ray = ray / jnp.linalg.norm(ray[..., :3], axis=-1, keepdims=True)
    weight = jnp.einsum("btk,bk->bt", ray[..., :3], pzaxis[:, :3])
    ok = view_valid & (weight >= jnp.cos(angle_threshold))

    newlevel = plan["newlevel"]
    P = cams.P[vid]
    center2 = project(P, coord[:, None, :], level)
    dx = project(P, (coord + pxaxis)[:, None, :], level) - center2
    dy = project(P, (coord + pyaxis)[:, None, :], level) - center2
    scale = (2.0 ** (newlevel - level)).astype(center2.dtype)[..., None]
    c2 = center2[..., :2] / scale
    dx2 = dx[..., :2] / scale
    dy2 = dy[..., :2] / scale

    # grabSafe against the level dims (optim.cpp:783-805)
    span = (jnp.abs(dx2) + jnp.abs(dy2)) * margin
    w = pyr.widths[newlevel, vid].astype(c2.dtype)
    h = pyr.heights[newlevel, vid].astype(c2.dtype)
    margin2 = 3.0
    minxy = c2 - span
    maxxy = c2 + span
    ok = ok & ((minxy[..., 0] >= margin2) & (minxy[..., 1] >= margin2)
               & (maxxy[..., 0] < w - 1 - margin2)
               & (maxxy[..., 1] < h - 1 - margin2))

    pos = _sample_positions(c2, dx2, dy2, ok, wsize)
    rel = pos - plan["origin"][:, :, None, :].astype(pos.dtype)
    rel = jnp.clip(rel, 0.0, k - 1.0)
    s2 = pos.shape[2]
    return (rel[..., 0].reshape(b * t, s2),
            rel[..., 1].reshape(b * t, s2), ok)


def grab_block_geometry(cams: CameraSet, pyr: PyramidSet, level: int,
                        wsize: int, coord, pxaxis, pyaxis, pzaxis, views,
                        view_valid, angle_threshold: float = jnp.pi / 3.0,
                        k: int | None = None):
    """Kernel-ready grab geometry for the fused Pallas INCC kernel.

    Returns (starts [B*T, 3] int32 (n, sy, sx_atlas), relx [B*T, S2],
    rely [B*T, S2], ok [B, T] bool)."""
    from .pallas_incc import BLOCK_K
    if k is None:
        k = BLOCK_K
    c2, dx2, dy2, newlevel, vid, ok = _grab_frame(
        cams, pyr, level, wsize, coord, pxaxis, pyaxis, pzaxis, views,
        view_valid, angle_threshold)
    pos = _sample_positions(c2, dx2, dy2, ok, wsize)
    b, t, s2, _ = pos.shape

    pmin = pos.min(axis=2)
    start = jnp.floor(pmin).astype(jnp.int32) - 1
    x0 = pyr.xoff[newlevel]
    lvl_w = pyr.widths[newlevel, vid]
    lvl_h = pyr.heights[newlevel, vid]
    sx = jnp.clip(start[..., 0], 0, jnp.maximum(lvl_w - k, 0))
    sy = jnp.clip(start[..., 1], 0, jnp.maximum(lvl_h - k, 0))
    rel = pos - jnp.stack([sx, sy], -1)[:, :, None, :].astype(pos.dtype)

    starts = jnp.stack([vid, sy, sx + x0], -1).reshape(b * t, 3)
    return (starts.astype(jnp.int32), rel[..., 0].reshape(b * t, s2),
            rel[..., 1].reshape(b * t, s2), ok)


# Block-extraction sampling: instead of 4 scalar gathers per sample (the
# reference's getColor), pull one KxK pixel block per (patch, view) with a
# vmapped dynamic_slice and evaluate all wsize^2 bilinear samples as dense
# hat-function contractions - gathers become contiguous block loads and
# the interpolation runs on the VPU/MXU. Window span is bounded: the
# tangent axes are ~1px at the selected pyramid level (|dx|,|dy| in
# [2^-0.5, 2^0.5] after leveldif rounding, optim.cpp:831-843), so
# (wsize-1)*(|dx|+|dy|) + bilinear support fits in BLOCK_K for wsize<=9.
_USE_BLOCK_SAMPLING = True
BLOCK_K = 20


def _block_bilinear(pyr: PyramidSet, vid, newlevel, pos, ok):
    """pos: [B, T, S2, 2] level-newlevel pixel coords. Returns
    [B, T, S2, 3]."""
    k = BLOCK_K
    b, t, s2, _ = pos.shape
    # block origin: cover [min-1, min-1+K) in both axes
    pmin = pos.min(axis=2)                                   # [B, T, 2]
    start = jnp.floor(pmin).astype(jnp.int32) - 1
    h, wa = pyr.atlas.shape[1], pyr.atlas.shape[2]
    # clamp inside the atlas; x additionally inside this level's strip so
    # blocks never straddle neighboring mip levels
    x0 = pyr.xoff[newlevel]
    lvl_w = pyr.widths[newlevel, vid]
    lvl_h = pyr.heights[newlevel, vid]
    sx = jnp.clip(start[..., 0], 0, jnp.maximum(lvl_w - k, 0)) + x0
    sy = jnp.clip(start[..., 1], 0, jnp.maximum(lvl_h - k, 0))

    # one lax.gather of [K, K, 3] blocks (a vmapped dynamic_slice would
    # materialize the whole atlas per element)
    starts = jnp.stack([
        vid.reshape(-1), sy.reshape(-1), sx.reshape(-1),
        jnp.zeros(b * t, jnp.int32)], axis=1)               # [BT, 4]
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2, 3))
    region = jax.lax.gather(
        pyr.atlas, starts, dnums, slice_sizes=(1, k, k, 3),
        mode=jax.lax.GatherScatterMode.CLIP)
    region = region.reshape(b, t, k, k, 3)

    rel = pos - jnp.stack([sx - x0, sy], -1)[:, :, None, :].astype(
        pos.dtype)
    grid = jnp.arange(k, dtype=pos.dtype)
    wx = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., 0:1] - grid))
    wy = jnp.maximum(0.0, 1.0 - jnp.abs(rel[..., 1:2] - grid))
    # contract rows then columns; S2 x K x 3 intermediate stays on-chip
    # after fusion (Pallas fuses this fully later)
    rows = jnp.einsum("btsy,btyxc->btsxc", wy, region)
    return jnp.einsum("btsx,btsxc->btsc", wx, rows)


def normalize_tex(texs, valid):
    """Zero per-channel mean, unit global variance per (patch, view)
    (reference optim.cpp:1031-1067)."""
    s2 = texs.shape[-2]
    mean = texs.mean(axis=-2, keepdims=True)            # per-channel
    dev = texs - mean
    var = (dev * dev).sum(axis=(-2, -1)) / (3.0 * s2)
    std = jnp.sqrt(var)
    std = jnp.where(std == 0.0, 1.0, std)
    out = dev / std[..., None, None]
    return jnp.where(valid[..., None, None], out, 0.0)


def ncc_dot(tex0, tex1):
    """Mean of elementwise products over the 3*S2 values
    (reference optim.cpp:1069-1077). tex*: [..., S2, 3]."""
    s2 = tex0.shape[-2]
    return (tex0 * tex1).sum(axis=(-2, -1)) / (3.0 * s2)
