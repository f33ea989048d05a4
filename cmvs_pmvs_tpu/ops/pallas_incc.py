"""Fused Pallas TPU kernel: bilinear grab + normalize + NCC.

The hot inner loop of patch refinement (SURVEY.md 3.4: per GN evaluation,
for <=tau views, grab a wsize^2 bilinear window, normalize, correlate with
the reference view). The pure-XLA formulation moves a [B, T, S2, K, 3]
interpolation intermediate (~GBs) through HBM on every evaluation; here
only the K x 3K source pixel blocks do:

  an XLA gather pulls one K x 3K interleaved-RGB block per (patch, view)
  pair out of the pyramid atlas (dynamic DMA starts inside a kernel would
  need 8/128-aligned origins; XLA gathers do not), and the Pallas kernel
  then runs entirely in VMEM: hat-function row/column contractions build
  the wsize^2 window on the MXU, normalization and the NCC dot against
  the patch's reference window happen in-register, and only the [B, T]
  robust INCCs are written back.

Geometry (projection, level selection, grabSafe) stays in XLA - it is
[B, T]-sized (ops.texture.grab_block_geometry).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_K = 20


def _incc_kernel(relx_ref, rely_ref, ok_ref, region_ref, out_ref, *,
                 ppb: int, t: int, s2: int, k: int):
    """One program = `ppb` patches x `t` views.

    relx/rely:  VMEM [pairs, s2] sample positions relative to the origin
    ok_ref:     VMEM [pairs, 1] f32 validity
    region_ref: VMEM [pairs, k, 3k] interleaved-RGB pixel blocks
    out_ref:    VMEM [pairs, 1] robust INCC vs the reference view
    """
    col = jax.lax.broadcasted_iota(jnp.int32, (s2, k), 1).astype(
        jnp.float32)
    # interleaved-RGB lane index -> pixel x (j // 3) for the x weights,
    # and a [3k, 3] channel-fold matrix (j % 3 == c) - both avoid minor
    # dim reshapes, which Mosaic does not support
    col3 = jax.lax.broadcasted_iota(jnp.int32, (s2, 3 * k), 1)
    colx3 = (col3 // 3).astype(jnp.float32)
    fold = (jax.lax.broadcasted_iota(jnp.int32, (3 * k, 3), 0) % 3
            == jax.lax.broadcasted_iota(jnp.int32, (3 * k, 3), 1)
            ).astype(jnp.float32)

    def window(p):
        """Normalized wsize^2 x 3 window of pair p."""
        wx3 = jnp.maximum(0.0, 1.0 - jnp.abs(relx_ref[p][:, None] - colx3))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rely_ref[p][:, None] - col))
        reg = region_ref[p]                              # [k, 3k]
        rows = jnp.dot(wy, reg, preferred_element_type=jnp.float32)
        tex = jnp.dot(rows * wx3, fold,
                      preferred_element_type=jnp.float32)  # [s2, 3]
        mean = tex.mean(axis=0, keepdims=True)
        dev = tex - mean
        var = (dev * dev).sum() / (3.0 * s2)
        std = jnp.sqrt(var)
        std = jnp.where(std == 0.0, 1.0, std)
        return dev / std

    for pp in range(ppb):
        base = pp * t
        ref_ok = ok_ref[base, 0] > 0.0
        ref_tex = window(base)
        vals = [jnp.where(ref_ok, 0.0, 2.0)]
        for tt in range(1, t):
            tex = window(base + tt)
            dot = (ref_tex * tex).sum() / (3.0 * s2)
            incc = (1.0 - dot) / (1.0 + 3.0 * (1.0 - dot))
            valid = ref_ok & (ok_ref[base + tt, 0] > 0.0)
            vals.append(jnp.where(valid, incc, 2.0))
        out_ref[pl.ds(base, t), 0] = jnp.stack(vals)


def _windows_kernel(relx_ref, rely_ref, ok_ref, region_ref, out_ref, *,
                    pairs: int, s2: int, k: int):
    """Emit the normalized windows themselves: out [pairs, 3*s2]
    (channel-major per sample: out[p, 3*s+c]). Used by the view-selection
    passes that need pairwise NCCs (setRefImage, constraintImages) - the
    small [*, 3*s2] texture matrix leaves the chip and pairwise dots run
    as one XLA batched matmul."""
    col = jax.lax.broadcasted_iota(jnp.int32, (s2, k), 1).astype(
        jnp.float32)
    col3 = jax.lax.broadcasted_iota(jnp.int32, (s2, 3 * k), 1)
    colx3 = (col3 // 3).astype(jnp.float32)
    fold = (jax.lax.broadcasted_iota(jnp.int32, (3 * k, 3), 0) % 3
            == jax.lax.broadcasted_iota(jnp.int32, (3 * k, 3), 1)
            ).astype(jnp.float32)
    # scatter [s2, 3] windows into a [s2, 3*s2] strip: W[s, 3*s+c]
    sel = (jax.lax.broadcasted_iota(jnp.int32, (3, 3 * s2), 1) % 3
           == jax.lax.broadcasted_iota(jnp.int32, (3, 3 * s2), 0)
           ).astype(jnp.float32)
    srow = jax.lax.broadcasted_iota(jnp.int32, (s2, 3 * s2), 0)
    scol = jax.lax.broadcasted_iota(jnp.int32, (s2, 3 * s2), 1) // 3
    smask = (srow == scol).astype(jnp.float32)

    for p in range(pairs):
        wx3 = jnp.maximum(0.0, 1.0 - jnp.abs(relx_ref[p][:, None] - colx3))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(rely_ref[p][:, None] - col))
        reg = region_ref[p]
        rows = jnp.dot(wy, reg, preferred_element_type=jnp.float32)
        tex = jnp.dot(rows * wx3, fold,
                      preferred_element_type=jnp.float32)   # [s2, 3]
        mean = tex.mean(axis=0, keepdims=True)
        dev = tex - mean
        var = (dev * dev).sum() / (3.0 * s2)
        std = jnp.sqrt(var)
        std = jnp.where(std == 0.0, 1.0, std)
        texn = dev / std
        ok = ok_ref[p, 0] > 0.0
        # place tex[s, c] at column 3*s+c: (texn @ sel) masked to s == s'
        strip = jnp.dot(texn, sel,
                        preferred_element_type=jnp.float32) * smask
        out_ref[p, :] = jnp.where(ok, strip.sum(axis=0),
                                  jnp.zeros(3 * s2, jnp.float32))


@functools.partial(jax.jit, static_argnames=("t", "s2", "k"))
def windows_pallas(atlas, starts, relx, rely, ok, *, t: int, s2: int,
                   k: int = BLOCK_K):
    """Normalized wsize^2 windows for [B*T] pairs -> [B, T, s2, 3]
    (zeros where the grab failed)."""
    bt = starts.shape[0]
    b = bt // t
    pairs = 8 * t           # rows per program, multiple of 8
    nblocks = -(-bt // pairs)
    pad = nblocks * pairs - bt
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        relx = jnp.pad(relx, ((0, pad), (0, 0)))
        rely = jnp.pad(rely, ((0, pad), (0, 0)))
        ok = jnp.pad(ok, (0, pad))
    regions = _gather_blocks(atlas, starts, k)
    kernel = functools.partial(_windows_kernel, pairs=pairs, s2=s2, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((pairs, s2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, s2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, k, 3 * k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pairs, 3 * s2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * pairs, 3 * s2),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(relx, rely, ok[:, None], regions)
    return out[:bt].reshape(b, t, s2, 3)


def pick_ppb(t: int, max_pairs: int = 24) -> int:
    """Patches per program such that ppb*t is a multiple of 8 (TPU
    sublane tiling) and stays under max_pairs."""
    ppb = 1
    while (ppb * t) % 8 != 0:
        ppb += 1
    while (2 * ppb * t) <= max_pairs and (2 * ppb * t) % 8 == 0:
        ppb *= 2
    return ppb


def _gather_blocks(atlas, starts, k: int):
    """[BT, k, 3k] interleaved-RGB blocks via one XLA gather."""
    n, h, wa, _ = atlas.shape
    atlas2 = atlas.reshape(n, h, wa * 3)
    s = starts.at[:, 2].set(starts[:, 2] * 3)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2))
    return jax.lax.gather(
        atlas2, s, dnums, slice_sizes=(1, k, 3 * k),
        mode=jax.lax.GatherScatterMode.CLIP)


@functools.partial(jax.jit, static_argnames=("ppb", "t", "s2", "k"))
def incc_pallas_regions(regions, relx, rely, ok, *, ppb: int, t: int,
                        s2: int, k: int):
    """Kernel invocation against pre-fetched blocks.

    regions: [BTb, k, 3k] from _gather_blocks; relx/rely/ok may be an
    m-fold probe batch (BT = m * BTb, whole-batch concatenation) - the
    region block index wraps modulo the base batch so probe evaluations
    reuse the same fetched blocks. BTb must be a multiple of ppb*t.
    """
    btb = regions.shape[0]
    bt = relx.shape[0]
    pairs = ppb * t
    assert btb % pairs == 0, (btb, pairs)
    assert bt % btb == 0, (bt, btb)
    nb_base = btb // pairs
    nblocks = bt // pairs
    b = bt // t

    kernel = functools.partial(_incc_kernel, ppb=ppb, t=t, s2=s2, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((pairs, s2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, s2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, k, 3 * k),
                         lambda i: (jax.lax.rem(i, nb_base), 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pairs, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bt, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(relx, rely, ok[:, None], regions)
    return out[:, 0].reshape(b, t)


def gather_blocks(atlas, starts, k: int):
    """Public alias of the block fetch (one XLA gather)."""
    return _gather_blocks(atlas, starts, k)


@functools.partial(jax.jit, static_argnames=("ppb", "t", "s2", "k"))
def incc_pallas(atlas, starts, relx, rely, ok, *, ppb: int, t: int,
                s2: int, k: int = BLOCK_K):
    """atlas [N, H, WA, 3]; starts [B*T, 3] int32 (n, sy, sx_atlas);
    relx/rely [B*T, S2] f32; ok [B*T] f32.

    Returns incc [B, T] (2.0 invalid; 0.0 in the reference slot when the
    reference grab succeeded)."""
    bt = starts.shape[0]
    b = bt // t
    nblocks = -(-b // ppb)
    pad = nblocks * ppb * t - bt
    if pad:
        starts = jnp.pad(starts, ((0, pad), (0, 0)))
        relx = jnp.pad(relx, ((0, pad), (0, 0)))
        rely = jnp.pad(rely, ((0, pad), (0, 0)))
        ok = jnp.pad(ok, (0, pad))

    regions = _gather_blocks(atlas, starts, k)

    pairs = ppb * t
    kernel = functools.partial(_incc_kernel, ppb=ppb, t=t, s2=s2, k=k)
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[
            pl.BlockSpec((pairs, s2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, s2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((pairs, k, 3 * k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((pairs, 1), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * pairs, 1), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
    )(relx, rely, ok[:, None], regions)
    return out[:bt, 0].reshape(b, t)
