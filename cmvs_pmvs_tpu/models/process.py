"""The per-candidate pipeline: preProcess -> refine -> postProcess.

Shared by seeding and expansion (reference seed.cpp:387-414 and
expand.cpp:200-256 both call COptim::preProcess / refinePatch /
postProcess, optim.cpp:95-190). Operates on [B] batches of candidate
patches with dense view masks; every gate is a mask update, and the final
`success` mask tells callers which candidates became patches.

Deviations from the reference, by design (see SURVEY.md section 7 "hard
parts"): candidates are processed in parallel waves rather than
sequentially per thread, and stored view sets are capped at t_store slots.
The depth>=2 gain/quad check (optim.cpp:363-383) runs inside the filter
stage instead of per candidate.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geom.cameras import CameraSet
from ..image.pyramid import PyramidSet
from ..image.sample import mask_all
from ..ops.refine import make_problem, refine_patches, set_scales
from .config import EngineConfig, Thresholds
from .grid import GridState, cell_of, is_visible
from .patches import PatchCloud
from . import views as V


class ProcessResult(NamedTuple):
    success: jax.Array    # [B] bool
    coord: jax.Array      # [B, 4]
    normal: jax.Array     # [B, 4]
    ncc: jax.Array        # [B]
    images: jax.Array     # [B, T_store] int32, slot 0 = reference
    grids: jax.Array      # [B, T_store, 2]
    vimages: jax.Array    # [B, T_store]
    vgrids: jax.Array     # [B, T_store, 2]
    timages: jax.Array    # [B]
    dscale: jax.Array     # [B]
    ascale: jax.Array     # [B]


def _set_grids(cams, cfg: EngineConfig, coord, views, valid):
    ix, iy = cell_of(cams, cfg.level, cfg.csize, coord[:, None, :], views)
    return jnp.stack([ix, iy], axis=-1), valid


def process_candidates(cams: CameraSet, pyr: PyramidSet, cfg: EngineConfig,
                       thr: Thresholds, visdata, coord, normal, vmask, ref,
                       depth: int,
                       grid: GridState | None = None,
                       cloud: PatchCloud | None = None,
                       active=None,
                       refine_iters: int = 12) -> ProcessResult:
    """Run the full candidate pipeline on a [B] batch.

    visdata: [N, N] bool adjacency; vmask [B, N] initial views; ref [B].
    depth: phase counter (0 during seeding; >=1 enables vimages via the
    depth maps in `grid`/`cloud`).
    """
    b = coord.shape[0]
    if active is None:
        active = jnp.ones(b, bool)

    # ---- preProcess (optim.cpp:95-122) ----
    vmask = V.add_images(cams, pyr, visdata, cfg.level, coord, normal,
                         vmask, ref)
    vmask = V.constraint_images(cams, pyr, cfg.level, cfg.wsize, coord,
                                normal, ref, vmask, thr.ncc_before)
    views, vvalid = V.sort_images(cams, cfg.level, coord, normal, ref,
                                  vmask, cfg.t_store)
    nview = vvalid.sum(axis=1)
    ok = active & (nview >= cfg.min_image_num)

    dscale, ascale = set_scales(
        cams, cfg.level, cfg.wsize, coord,
        views[:, :cfg.tau], vvalid[:, :cfg.tau])
    ok = ok & V.check_angles(cams, coord, views, vvalid,
                             thr.max_angle, thr.angle1)

    # ---- refine (optim.cpp:496-658) ----
    prob = make_problem(cams, cfg.level, coord, normal,
                        views[:, :cfg.tau], vvalid[:, :cfg.tau], dscale,
                        cfg.min_image_num)
    coord, normal, ncc, _ = refine_patches(
        cams, pyr, cfg.level, cfg.wsize, prob, coord, normal,
        num_iters=refine_iters, active=ok)

    # ---- postProcess (optim.cpp:150-190) ----
    # re-derive the view mask from the refined geometry
    vmask = jnp.zeros_like(vmask).at[
        jnp.arange(b)[:, None], jnp.maximum(views, 0)].max(vvalid)
    ok = ok & (mask_all(pyr, cams.P, coord, cfg.level))
    # useBound gate (reference optim.cpp:153)
    from ..image.sample import inside_bimages
    ok = ok & inside_bimages(pyr, cams.P, coord, cfg.level,
                             cfg.bindexes)
    vmask = V.add_images(cams, pyr, visdata, cfg.level, coord, normal,
                         vmask, ref)
    vmask = V.constraint_images(cams, pyr, cfg.level, cfg.wsize, coord,
                                normal, ref, vmask, thr.ncc)
    vmask = V.filter_images_by_angle(cams, coord, normal, ref, vmask,
                                     thr.angle1)
    ok = ok & (vmask.sum(axis=1) >= cfg.min_image_num)

    ref, ref_ok = V.set_ref_image(cams, pyr, cfg.level, cfg.wsize, cfg.tn,
                                  coord, normal, ref, vmask)
    ok = ok & ref_ok
    vmask = V.constraint_images(cams, pyr, cfg.level, cfg.wsize, coord,
                                normal, ref, vmask, thr.ncc)
    ok = ok & (vmask.sum(axis=1) >= cfg.min_image_num)

    # materialize the stored view list (ref first)
    views, vvalid = V.sort_images(cams, cfg.level, coord, normal, ref,
                                  vmask, cfg.t_store)
    grids, _ = _set_grids(cams, cfg, coord, views, vvalid)
    views = jnp.where(vvalid, views, -1)
    timages = (vvalid & (views >= 0) & (views < cfg.tn)).sum(
        axis=1).astype(jnp.int32)

    # recompute ncc with the final view set
    prob2 = make_problem(cams, cfg.level, coord, normal,
                         views[:, :cfg.tau], vvalid[:, :cfg.tau], dscale,
                         cfg.min_image_num)
    from ..ops.refine import compute_weighted_incc
    ncc = compute_weighted_incc(cams, pyr, cfg.level, cfg.wsize, prob2,
                                coord, normal)

    # vimages: extra target views passing the depth test + edge
    # (patchOrganizerS.cpp:420-450), only once depth maps exist
    vimages = jnp.full_like(views, -1)
    vgrids = jnp.zeros_like(grids)
    if depth >= 1 and grid is not None and cloud is not None:
        vimages, vgrids = set_vimages(
            cams, pyr, cfg, thr, grid, cloud, coord, normal, views, vvalid,
            cfg.t_store)

    return ProcessResult(success=ok, coord=coord, normal=normal, ncc=ncc,
                         images=views, grids=grids, vimages=vimages,
                         vgrids=vgrids, timages=timages, dscale=dscale,
                         ascale=ascale)


def set_vimages(cams, pyr, cfg: EngineConfig, thr: Thresholds,
                grid: GridState, cloud: PatchCloud, coord, normal, views,
                vvalid, cap: int):
    """Discover depth-visible target views not already in the view list
    (reference patchOrganizerS.cpp:420-450): depth-test with
    strict=neighbor(0.5) plus an edge-map pass; returns -1-padded
    [B, cap] vimages and their cells."""
    b = coord.shape[0]
    tn = cfg.tn
    used = jnp.zeros((b, tn), bool)
    tv = jnp.where((views >= 0) & (views < tn), views, 0)
    used = used.at[jnp.arange(b)[:, None], tv].max(
        (views >= 0) & (views < tn))

    tgt = jnp.arange(tn)
    ix, iy = cell_of(cams, cfg.level, cfg.csize, coord[:, None, :],
                     jnp.broadcast_to(tgt[None], (b, tn)))
    vis = is_visible(cams, cloud, grid, cfg.level, cfg.csize,
                     coord[:, None, :], normal[:, None, :],
                     jnp.broadcast_to(tgt[None], (b, tn)), ix, iy,
                     thr.neighbor)
    from ..image.sample import edge_at
    from ..geom.cameras import project
    ic = project(cams.P[tgt][None], coord[:, None, :], cfg.level)
    edge = edge_at(pyr, tgt[None], cfg.level, ic[..., 0], ic[..., 1]) > 0.0
    cand = vis & edge & ~used                                  # [B, TN]

    # pack up to `cap` candidate target views per patch
    order = jnp.argsort(~cand, axis=1)[:, :cap]                # Trues first
    got = jnp.take_along_axis(cand, order, axis=1)
    vimages = jnp.where(got, order.astype(jnp.int32), -1)
    vix = jnp.take_along_axis(ix, order, axis=1)
    viy = jnp.take_along_axis(iy, order, axis=1)
    vgrids = jnp.stack([vix, viy], axis=-1)
    return vimages, vgrids
