"""Patch expansion as vectorized frontier waves.

TPU-first port of CExpand (reference source/pmvs/expand.cpp): the
priority-queue of patches drained by threads becomes a frontier mask over
the cloud; each wave, every frontier patch proposes up to 6 tangent-plane
candidates (findEmptyBlocks, expand.cpp:108-180), candidates are gated,
deduplicated per cell, batch-refined, and the successes form the next
frontier. Per-cell attempt counters and the direction-failure bitmask
carry over exactly; ordering differs from the reference queue (score2
priority) by design - aggregate output is the comparison target
(SURVEY.md section 7).
"""
from __future__ import annotations

from dataclasses import replace
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom.cameras import CameraSet, get_unit
from ..image.pyramid import PyramidSet
from ..image.sample import mask_all
from .config import EngineConfig, Thresholds
from .grid import (
    CellTable, GridState, build_cell_table, cell_of, is_neighbor,
    rebuild_depth_maps, rebuild_occupancy,
)
from .patches import PatchCloud, append_patches
from .process import process_candidates
from . import views as V

HUGE = 1.0e10


def _ortho(normal):
    """Tangent basis from a normal (reference numeric/vec4.hpp:303-322)."""
    z = normal[..., :3]
    ax, ay, az = jnp.abs(z[..., 0]), jnp.abs(z[..., 1]), jnp.abs(z[..., 2])
    x0 = jnp.stack([z[..., 1], -z[..., 0], jnp.zeros_like(az)], -1)
    x1 = jnp.stack([jnp.zeros_like(ax), z[..., 2], -z[..., 1]], -1)
    x2 = jnp.stack([-z[..., 2], jnp.zeros_like(ay), z[..., 0]], -1)
    x = jnp.where((ax > 0.5)[..., None], x0,
                  jnp.where((ay > 0.5)[..., None], x1, x2))
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    zeros = jnp.zeros(x.shape[:-1] + (1,), x.dtype)
    return (jnp.concatenate([x, zeros], -1),
            jnp.concatenate([y, zeros], -1))


def compute_radius(cams: CameraSet, cfg: EngineConfig, coord, normal,
                   images, ivalid):
    """2nd-smallest per-view fineness unit x csize
    (reference expand.cpp:182-198)."""
    from ..ops.refine import compute_units
    units = compute_units(cams, cfg.level, coord, normal, images, ivalid)
    two = -jax.lax.top_k(-units, 2)[0]          # two smallest
    return two[:, 1] * cfg.csize


def patch_unit(cams: CameraSet, cfg: EngineConfig, coord, images, ivalid):
    """Mean getUnit over the patch's views x csize
    (reference patchOrganizerS.cpp:653-661)."""
    vid = jnp.maximum(images, 0)
    u = get_unit(cams, vid, coord[:, None, :], cfg.level)
    cnt = jnp.maximum(ivalid.sum(axis=1), 1)
    return jnp.where(ivalid, u, 0.0).sum(axis=1) / cnt * cfg.csize


class WaveStats(NamedTuple):
    candidates: jax.Array
    accepted: jax.Array
    dropped: jax.Array     # successes lost to capacity overflow


def find_empty_blocks(cams, cfg: EngineConfig, thr: Thresholds,
                      cloud: PatchCloud, tables: tuple[CellTable, CellTable],
                      frontier):
    """Per frontier patch, which of the 6 sectors lack neighbors
    (reference expand.cpp:108-180). Returns (cand_coord [P, 6, 4],
    cand_ok [P, 6], radius [P])."""
    p = cloud.capacity
    ivalid = cloud.images >= 0
    radius = compute_radius(cams, cfg, cloud.coord, cloud.normal,
                            cloud.images, ivalid)
    unit = patch_unit(cams, cfg, cloud.coord, cloud.images, ivalid)
    xdir, ydir = _ortho(cloud.normal)

    # neighbors: 3x3 cell window around each stored grid slot, from both
    # pgrids and vpgrids tables (findNeighbors margin=1, scale=4)
    ptab, vtab = tables
    t = cloud.max_views
    k = cfg.cell_k
    imgs = cloud.images                                     # [P, T]
    gx = cloud.grids[..., 0]
    gy = cloud.grids[..., 1]
    fills = jnp.zeros((p, 6))
    nb_radius = 1.5 * 1.0 * radius
    thr_n = thr.neighbor * 4.0

    # all 9 window offsets at once, kept flat [P, T*9] (a [P, T, 9]
    # intermediate would lane-pad 9 -> 128 at capacity, grid.lookup_flat)
    offs = jnp.array([(-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0), (1, 0),
                      (-1, 1), (0, 1), (1, 1)], jnp.int32)
    cx = jnp.repeat(gx, 9, axis=-1) + jnp.tile(offs[:, 0], t)[None]
    cy = jnp.repeat(gy, 9, axis=-1) + jnp.tile(offs[:, 1], t)[None]
    io = jnp.repeat(imgs, 9, axis=-1)
    ok9 = ((io >= 0) & (io < cfg.tn) & (cx >= 0) & (cx < cfg.gw)
           & (cy >= 0) & (cy < cfg.gh))
    key9 = (jnp.clip(io, 0, cfg.tn - 1) * cfg.gh
            + jnp.clip(cy, 0, cfg.gh - 1)) * cfg.gw \
        + jnp.clip(cx, 0, cfg.gw - 1)
    from .grid import is_neighbor_soa, soa_fields
    (cx_, cy_, cz_), (nx_, ny_, nz_), dq_ = soa_fields(cloud)
    for tab in (ptab, vtab):
        key = jnp.where(ok9, key9, tab.sentinel)
        pids, hit = tab.lookup_flat(key, k)             # [P, T*9*K]
        hit = hit & jnp.repeat(ok9, k, axis=-1) & (pids >= 0)
        q = jnp.maximum(pids, 0)
        neigh = is_neighbor_soa(
            (cx_[:, None], cy_[:, None], cz_[:, None]),
            (nx_[:, None], ny_[:, None], nz_[:, None]),
            cloud.dscale[:, None], q, cx_, cy_, cz_, nx_, ny_, nz_, dq_,
            unit[:, None], thr_n, radius=nb_radius[:, None])
        m = hit & neigh & (q != jnp.arange(p)[:, None])
        dxq = cx_[q] - cx_[:, None]
        dyq = cy_[q] - cy_[:, None]
        dzq = cz_[q] - cz_[:, None]
        f2x = dxq * xdir[:, 0:1] + dyq * xdir[:, 1:2] + dzq * xdir[:, 2:3]
        f2y = dxq * ydir[:, 0:1] + dyq * ydir[:, 1:2] + dzq * ydir[:, 2:3]
        ln = jnp.sqrt(f2x * f2x + f2y * f2y)
        rl = radius[:, None]
        m = m & (ln >= rl / 6.0) & (ln <= rl * 2.5)
        ang = jnp.arctan2(f2y, f2x)
        ang = jnp.where(ang < 0.0, ang + 2 * jnp.pi, ang)
        findex = ang / (2 * jnp.pi / 6.0)
        lo = jnp.floor(findex).astype(jnp.int32)
        hi = lo + 1
        wlo = (hi - findex)
        whi = (findex - lo)
        flat = jnp.zeros((p, 7))
        pid_b = jnp.broadcast_to(jnp.arange(p)[:, None], m.shape)
        flat = flat.at[pid_b, jnp.where(m, lo % 6, 6)].add(
            jnp.where(m, wlo, 0.0))
        flat = flat.at[pid_b, jnp.where(m, hi % 6, 6)].add(
            jnp.where(m, whi, 0.0))
        fills = fills + flat[:, :6]

    sector = jnp.arange(6)
    bit = (cloud.dflag[:, None] >> sector[None]) & 1
    ok = (fills <= 0.0) & (bit == 0) & frontier[:, None] & cloud.alive[:, None]
    ang = 2 * jnp.pi * sector / 6.0
    cand = (cloud.coord[:, None, :]
            + (jnp.cos(ang)[None, :, None] * xdir[:, None, :]
               + jnp.sin(ang)[None, :, None] * ydir[:, None, :])
            * radius[:, None, None])
    return cand, ok, radius


import functools as _functools


@_functools.partial(jax.jit,
                    static_argnames=("cfg", "depth", "budget",
                                     "refine_iters"))
def expand_wave(cams: CameraSet, pyr: PyramidSet, cfg: EngineConfig,
                thr: Thresholds, visdata, cloud: PatchCloud,
                grid: GridState, frontier, depth: int,
                budget: int, refine_iters: int = 10):
    """One expansion wave (jitted whole). Returns (cloud, grid,
    new_frontier, stats)."""
    p = cloud.capacity
    ptab = build_cell_table(cloud, cfg.tn, cfg.gh, cfg.gw, False)
    vtab = build_cell_table(cloud, cfg.tn, cfg.gh, cfg.gw, True)
    cand, cok, radius = find_empty_blocks(cams, cfg, thr, cloud,
                                          (ptab, vtab), frontier)

    # flatten candidates and compact to the processing budget; parents of
    # overflow-dropped candidates stay on the frontier for the next wave
    flat_ok = cok.reshape(-1)
    sel = jnp.nonzero(flat_ok, size=budget, fill_value=0)[0]
    sval = flat_ok[sel]
    parent = sel // 6
    sector = sel % 6
    coord = cand.reshape(-1, 4)[sel]
    chosen = jnp.zeros(p * 6, bool).at[sel].max(sval)
    overflow_parent = (flat_ok & ~chosen).reshape(p, 6).any(axis=1)

    # --- expandSub gates (expand.cpp:200-256) ---
    # project into the parent's images (setGridsImages)
    pimgs = cloud.images[parent]                           # [B, T]
    pval = pimgs >= 0
    ix, iy = cell_of(cams, cfg.level, cfg.csize, coord[:, None, :], pimgs)
    in_grid = (pval & (ix >= 0) & (ix < cfg.gw) & (iy >= 0)
               & (iy < cfg.gh))
    sval = sval & in_grid.any(axis=1)
    sval = sval & mask_all(pyr, cams.P, coord, cfg.level)
    # useBound gate (reference expand.cpp:212)
    from ..image.sample import inside_bimages
    sval = sval & inside_bimages(pyr, cams.P, coord, cfg.level,
                                 cfg.bindexes)

    # checkCounts (expand.cpp:258-323) over target-image cells
    is_t = pimgs >= 0
    tgt = in_grid & (pimgs < cfg.tn)
    ci = jnp.clip(pimgs, 0, cfg.tn - 1)
    cx = jnp.clip(ix, 0, cfg.gw - 1)
    cy = jnp.clip(iy, 0, cfg.gh - 1)
    occ_full = grid.occ[ci, cy, cx] > 0
    cnt_full = grid.counts[ci, cy, cx] >= thr.count1
    full = (tgt & (occ_full | cnt_full)).sum(axis=1)
    empty = (tgt & ~(occ_full | cnt_full)).sum(axis=1)
    slack = 0 if depth <= 1 else 1
    sval = sval & ~((empty < cfg.min_image_num - slack) & (full != 0))

    # dedupe: one candidate per (ref image, cell) per wave
    ref = jnp.maximum(pimgs[:, 0], 0)
    rix, riy = cell_of(cams, cfg.level, cfg.csize, coord, ref)
    ckey = (ref * cfg.gh + jnp.clip(riy, 0, cfg.gh - 1)) * cfg.gw \
        + jnp.clip(rix, 0, cfg.gw - 1)
    ckey = jnp.where(sval, ckey, cfg.tn * cfg.gh * cfg.gw)
    firstmap = jnp.full(cfg.tn * cfg.gh * cfg.gw + 1, budget, jnp.int32)
    firstmap = firstmap.at[ckey].min(jnp.arange(budget, dtype=jnp.int32))
    sval = sval & (firstmap[ckey] == jnp.arange(budget))

    # inherit normal; view mask = parent images that pass the edge map
    normal = cloud.normal[parent]
    vmask = jnp.zeros((budget, cfg.n), bool)
    vmask = vmask.at[jnp.arange(budget)[:, None],
                     jnp.maximum(pimgs, 0)].max(pval)
    vmask = V.remove_images_edge(pyr, cams, cfg.level, coord, vmask)
    sval = sval & vmask.any(axis=1)

    res = process_candidates(cams, pyr, cfg, thr, visdata, coord, normal,
                             vmask, ref, depth=depth, grid=grid,
                             cloud=cloud, active=sval,
                             refine_iters=refine_iters)
    success = res.success & sval

    # parent dflag |= bit on failure (expand.cpp:98-103). A (parent,
    # sector) pair occurs at most once per wave, so add == bitwise-or.
    fail = sval & ~success
    onehot = (1 << sector) * fail.astype(jnp.int32)
    dflag_updates = jnp.zeros(p + 1, jnp.int32).at[
        jnp.where(fail, parent, p)].add(onehot)
    new_dflag = cloud.dflag | dflag_updates[:p]
    cloud = replace(cloud, dflag=new_dflag)

    # updateCounts for successes (expand.cpp:325-406): bump every target
    # cell of images+vimages; requeue iff some cell was under threshold
    def bump(counts, images, grids, mask):
        im = images
        okc = (mask[:, None] & (im >= 0) & (im < cfg.tn)
               & (grids[..., 0] >= 0) & (grids[..., 0] < cfg.gw)
               & (grids[..., 1] >= 0) & (grids[..., 1] < cfg.gh))
        key = (jnp.clip(im, 0, cfg.tn - 1) * cfg.gh
               + jnp.clip(grids[..., 1], 0, cfg.gh - 1)) * cfg.gw \
            + jnp.clip(grids[..., 0], 0, cfg.gw - 1)
        key = jnp.where(okc, key, cfg.tn * cfg.gh * cfg.gw)
        under = grid.counts.reshape(-1)[jnp.clip(
            key, 0, cfg.tn * cfg.gh * cfg.gw - 1)] < thr.count1
        under = under & okc
        flat = jnp.zeros(cfg.tn * cfg.gh * cfg.gw + 1, jnp.int32)
        flat = flat.at[key].add(1)
        return flat[:-1].reshape(grid.counts.shape), under.any(axis=1)

    c1, under1 = bump(grid.counts, res.images, res.grids, success)
    c2, under2 = bump(grid.counts, res.vimages, res.vgrids, success)
    grid = replace(grid, counts=grid.counts + c1 + c2)
    requeue = success & (under1 | under2)

    # append successes; new frontier = the slots they landed in
    before = cloud.alive
    new = PatchCloud(
        coord=res.coord, normal=res.normal, ncc=res.ncc,
        images=res.images, grids=res.grids, vimages=res.vimages,
        vgrids=res.vgrids, timages=res.timages, dscale=res.dscale,
        ascale=res.ascale, dflag=jnp.zeros(budget, jnp.int32),
        alive=success)
    # requeue flag rides along: patches appended but not requeued leave
    # the frontier immediately
    cloud2, dropped = append_patches(cloud, new, success)
    appended = cloud2.alive & ~before
    # mark non-requeue patches: distribute `requeue` to landed slots by
    # order: appended slots are filled in index order matching the order
    # of success rows
    app_idx = jnp.nonzero(appended, size=budget, fill_value=p)[0]
    src_idx = jnp.nonzero(success, size=budget, fill_value=budget)[0]
    req = jnp.concatenate([requeue, jnp.zeros(1, bool)])[
        jnp.clip(src_idx, 0, budget)]
    new_frontier = jnp.zeros(p, bool).at[
        jnp.clip(app_idx, 0, p - 1)].max(
            req & (app_idx < p), mode="drop")
    new_frontier = new_frontier | (overflow_parent & cloud2.alive[:p])

    occ, vocc = rebuild_occupancy(cloud2, cfg.tn, cfg.gh, cfg.gw)
    dmin, didx = rebuild_depth_maps(cams, cloud2, cfg.level, cfg.csize,
                                    cfg.tn, cfg.gh, cfg.gw)
    grid = replace(grid, occ=occ, vocc=vocc, depth=dmin, depth_idx=didx)

    stats = WaveStats(candidates=sval.sum(),
                      accepted=success.sum(), dropped=dropped)
    return cloud2, grid, new_frontier, stats
