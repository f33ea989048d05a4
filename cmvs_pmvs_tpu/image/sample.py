"""Subpixel sampling out of the packed pyramid atlas.

Implements the reference's bilinear getColor (include/image/image.hpp
:434-499, the default non-bicubic path) plus nearest-neighbor mask/edge
lookups (image.hpp getMask/getEdge), all as gathers into the atlas so the
pyramid `level` argument can be a traced per-sample integer.

All functions broadcast over arbitrary leading batch dims of
(index, level, x, y).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .pyramid import PyramidSet


def _atlas_gather(plane: jax.Array, n, xi, yi):
    """plane: [N, H, WA(, C)]; integer gather with clamped indices."""
    h, wa = plane.shape[1], plane.shape[2]
    xi = jnp.clip(xi, 0, wa - 1)
    yi = jnp.clip(yi, 0, h - 1)
    return plane[n, yi, xi]


def bilinear_color(pyr: PyramidSet, n, level, x, y):
    """Bilinear RGB sample at level-l pixel coords (x, y) of view n.

    Matches reference CImage::getColor bilinear branch
    (image.hpp:434-471): truncation to (lx, ly), 2x2 lerp. Returns [..., 3]
    float (0..255 scale). Out-of-image behavior is clamped, not checked -
    callers gate with grabSafe-style margins first (optim.cpp:783-805).
    """
    xo = pyr.xoff[level]
    lx = jnp.floor(x).astype(jnp.int32)
    ly = jnp.floor(y).astype(jnp.int32)
    dx1 = (x - lx)[..., None]
    dy1 = (y - ly)[..., None]
    dx0 = 1.0 - dx1
    dy0 = 1.0 - dy1

    ax = lx + xo
    c00 = _atlas_gather(pyr.atlas, n, ax, ly)
    c10 = _atlas_gather(pyr.atlas, n, ax + 1, ly)
    c01 = _atlas_gather(pyr.atlas, n, ax, ly + 1)
    c11 = _atlas_gather(pyr.atlas, n, ax + 1, ly + 1)
    return (c00 * dx0 * dy0 + c10 * dx1 * dy0
            + c01 * dx0 * dy1 + c11 * dx1 * dy1)


def _cubic_weights(p):
    """The reference's cubic-convolution (a=-1) weights for fraction p
    (image.hpp:286-302, FURUKAWA_IMAGE_BICUBIC): tap offsets -1..2."""
    f0 = 1.0 + p
    w0 = ((-f0 + 5.0) * f0 - 8.0) * f0 + 4.0
    w1 = (p - 2.0) * p * p + 1.0
    f2 = 1.0 - p
    w2 = (f2 - 2.0) * f2 * f2 + 1.0
    f3 = 2.0 - p
    w3 = ((-f3 + 5.0) * f3 - 8.0) * f3 + 4.0
    return w0, w1, w2, w3


def bicubic_color(pyr: PyramidSet, n, level, x, y):
    """Bicubic RGB sample - the reference's compile-time
    FURUKAWA_IMAGE_BICUBIC getColor variant (image.hpp:282-433):
    4x4 cubic convolution with a = -1 around floor(x), floor(y)."""
    xo = pyr.xoff[level]
    lx = jnp.floor(x).astype(jnp.int32)
    ly = jnp.floor(y).astype(jnp.int32)
    wx = _cubic_weights((x - lx)[..., None])
    wy = _cubic_weights((y - ly)[..., None])
    ax = lx + xo
    out = 0.0
    for j, wyj in enumerate(wy):
        row = 0.0
        for i, wxi in enumerate(wx):
            row = row + wxi * _atlas_gather(pyr.atlas, n, ax + i - 1,
                                            ly + j - 1)
        out = out + wyj * row
    return out


def _nearest_plane(plane, pyr: PyramidSet, n, level, x, y):
    """Nearest lookup: floor(v + 0.5) int conversion. Out-of-bounds
    returns 1 (pass), matching reference CImage::getMask/getEdge
    (image.hpp:553-564, 581-593: `if (ix < 0 || width <= ix ...) return 1`).
    """
    xo = pyr.xoff[level]
    xi = jnp.floor(x + 0.5).astype(jnp.int32)
    yi = jnp.floor(y + 0.5).astype(jnp.int32)
    w = pyr.widths[level, n]
    h = pyr.heights[level, n]
    inb = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    val = _atlas_gather(plane, n, xi + xo, yi)
    return jnp.where(inb, val, 1.0)


def mask_at(pyr: PyramidSet, n, level, x, y):
    """Mask lookup (1.0 = in) at level-l pixel coords of view n."""
    return _nearest_plane(pyr.mask_atlas, pyr, n, level, x, y)


def edge_at(pyr: PyramidSet, n, level, x, y):
    """Edge/texturedness lookup (1.0 = usable)."""
    return _nearest_plane(pyr.edge_atlas, pyr, n, level, x, y)


def mask_all(pyr: PyramidSet, cams_P, coord, level: int):
    """AND of masks over all views at the projections of a 3D point
    (reference photoSetS.hpp:108-119 CPhotoSetS::getMask(coord, level);
    per-view lookups pass when out of bounds or when no mask is loaded).

    coord: [..., 4]; returns [...] bool.
    """
    n = pyr.num_images
    from ..geom.cameras import project
    ic = project(cams_P, coord[..., None, :], level)  # [..., N, 3]
    x, y = ic[..., 0], ic[..., 1]
    ns = jnp.arange(n)
    val = _nearest_plane(pyr.mask_atlas, pyr, ns, level, x, y)
    return jnp.all(val > 0.0, axis=-1)


def inside_bimages(pyr, P, coord, level: int, bindexes: tuple):
    """insideBimages (reference findMatch.cpp:109-118): the coord must
    project inside [0, w-1] x [0, h-1] of EVERY bounding image. Empty
    bindexes (useBound off) -> all True. coord [..., 4]."""
    if not bindexes:
        return jnp.ones(coord.shape[:-1], bool)
    from ..geom.cameras import project
    bi = jnp.asarray(bindexes, jnp.int32)
    ic = project(P[bi], coord[..., None, :], level)
    w = pyr.widths[level, bi].astype(ic.dtype)
    h = pyr.heights[level, bi].astype(ic.dtype)
    ok = ((ic[..., 0] >= 0.0) & (ic[..., 0] <= w - 1)
          & (ic[..., 1] >= 0.0) & (ic[..., 1] <= h - 1))
    return ok.all(axis=-1)
