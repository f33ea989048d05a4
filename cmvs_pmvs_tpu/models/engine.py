"""PMVS engine orchestration: the CFindMatch equivalent.

Ties the phases together (reference source/pmvs/findMatch.cpp:187-220):
seed once, then 3 iterations of { expand-to-fixpoint, filter } with the
NCC thresholds relaxed by 0.05 per iteration. Wave loops run in Python
around jitted phase bodies; all state lives in fixed-capacity arrays.
"""
from __future__ import annotations

import math
import os
import time
from dataclasses import dataclass, replace

import numpy as np
import jax
import jax.numpy as jnp

from ..geom.cameras import CameraSet, build_camera_set, project
from ..image.pyramid import PyramidSet, build_pyramids, set_edge
from ..io.cameras import read_camera_txt
from ..io.images import find_image_path, load_image, load_pgm_mask
from ..ops.detect import detect_features
from ..utils.options import PMVSOptions, build_visdata
from .config import EngineConfig, Thresholds
from .expand import expand_commit, expand_discover
from .grid import GridState, empty_grid
from .patches import PatchCloud, empty_cloud
from .seed import run_seed
from .views import collect_images_all


@dataclass
class SceneData:
    """Loaded inputs of one PMVS problem."""

    cams: CameraSet
    pyr: PyramidSet
    images: list[np.ndarray]
    image_ids: list[int]          # original on-disk ids (timages+oimages)
    visdata: jnp.ndarray          # [N, N] bool
    distances: jnp.ndarray        # [N, N]


def load_scene(prefix: str, opt: PMVSOptions,
               dtype=jnp.float32) -> SceneData:
    """Read images/cameras for timages+oimages (reference
    CPhotoSetS::init photoSetS.cpp:12-77 with maxLevel=level+3,
    findMatch.cpp:72)."""
    opt = opt.resolve_oimages(prefix)
    ids = list(opt.timages) + list(opt.oimages)
    images, masks, Ps = [], [], []
    for img_id in ids:
        path = find_image_path(os.path.join(prefix, "visualize"), img_id)
        if path is None:
            raise FileNotFoundError(
                f"no image for id {img_id} under {prefix}/visualize")
        images.append(load_image(path))
        mpath = find_image_path(os.path.join(prefix, "masks"), img_id,
                                exts=(".pgm", ".pbm", ".png"))
        masks.append(load_pgm_mask(mpath) if mpath else None)
        Ps.append(read_camera_txt(
            os.path.join(prefix, "txt", "%08d.txt" % img_id)))

    num_levels = opt.level + 3
    cams = build_camera_set(np.stack(Ps), dtype=dtype)
    any_mask = any(m is not None for m in masks)
    pyr = build_pyramids(images, masks if any_mask else None, num_levels)
    if opt.set_edge != 0.0:
        pyr = set_edge(pyr, images, opt.set_edge)
    from ..ops.refine import _pallas_enabled
    if _pallas_enabled():
        from ..image.pyramid import with_tiles
        pyr = with_tiles(pyr)

    visdata_lists = build_visdata(opt, prefix)
    n = len(ids)
    vis = np.zeros((n, n), bool)
    for y, row in enumerate(visdata_lists):
        vis[y, row] = True

    distances = compute_distances(cams)
    return SceneData(cams=cams, pyr=pyr, images=images, image_ids=ids,
                     visdata=jnp.asarray(vis),
                     distances=jnp.asarray(distances, dtype))


def compute_distances(cams: CameraSet) -> np.ndarray:
    """Pairwise view distances: normalized baseline + optical-axis angle
    penalty (reference photoSetS.cpp:195-235)."""
    c = np.asarray(cams.center[:, :3], np.float64)
    d = np.linalg.norm(c[:, None] - c[None], axis=-1)
    off = ~np.eye(len(c), dtype=bool)
    ave = d[off].mean() if off.any() else 1.0
    if ave == 0.0:
        raise ValueError("All the optical centers are identical")
    d = d / ave
    ax = np.asarray(cams.oaxis[:, :3], np.float64)
    margin = math.cos(10.0 * math.pi / 180.0)
    d = d + np.maximum(0.0, 1.0 - ax @ ax.T - margin)
    return d.astype(np.float32)


def _bucket(n: int, cap: int, lo: int = 2048) -> int:
    """Smallest x4-bucket >= n (>= lo), capped at `cap`: static batch
    sizes for the jitted phases, few enough that each phase compiles a
    handful of specializations instead of one per wave."""
    b = lo
    while b < n and b < cap:
        b *= 4
    return min(b, cap)


def _bucket15(n: int, cap: int, lo: int = 1024) -> int:
    """Smallest bucket >= n from {lo*2^k} U {1.5*lo*2^k}, capped at
    `cap`: refine-batch sizes with <= 33% padding waste (the x4 buckets
    wasted up to 4x of the wave's dominant cost - the refine kernel -
    on real candidate counts)."""
    n = max(1, min(n, cap))
    b = lo
    while b < n:
        h = b * 3 // 2
        if h >= n:
            return min(h, cap)
        b *= 2
    return min(b, cap)


class PMVSEngine:
    """End-to-end dense reconstruction for one cluster (pmvs3 binary)."""

    def __init__(self, scene: SceneData, opt: PMVSOptions,
                 p_cap: int = 200_000, log=print, tracer=None, mesh=None):
        """`mesh`: optional jax.sharding.Mesh with a `patch` axis
        (parallel/engine_shard.make_engine_mesh); when set, the patch
        cloud is sharded across it and every phase runs multi-chip
        under GSPMD."""
        self.scene = scene
        self.opt = opt
        self.mesh = mesh
        n = scene.cams.num
        tn = len(opt.timages)
        level, csize = opt.level, opt.csize
        w0 = int(np.asarray(scene.pyr.widths[level]).max())
        h0 = int(np.asarray(scene.pyr.heights[level]).max())
        gw = (w0 + csize - 1) // csize
        gh = (h0 + csize - 1) // csize
        if mesh is not None:
            from ..parallel.engine_shard import round_capacity
            p_cap = round_capacity(p_cap, mesh)
        bindexes = ()
        if opt.use_bound:
            # the reference always reads bimages.dat when useBound is set
            # (option.cpp:301-324); silently running unbounded would
            # defeat a user-requested gate
            if not getattr(opt, "prefix", None):
                raise ValueError(
                    "useBound is set but the options carry no prefix to "
                    "locate bimages.dat (construct PMVSOptions with "
                    "prefix=, or clear use_bound)")
            from ..utils.options import read_bimages
            bindexes = read_bimages(opt.prefix, scene.image_ids)
        self.cfg = EngineConfig.from_options(opt, n, tn, gh, gw, p_cap,
                                             bindexes=bindexes)
        # live capacity: grows on overflow (auto-grow), independent of
        # the static cfg so growth does not re-specialize the phases
        self.p_cap = p_cap
        self.thr = Thresholds.initial(opt.threshold,
                                      opt.max_angle_threshold,
                                      opt.quad_threshold)
        self.cloud = empty_cloud(p_cap, self.cfg.t_store)
        self.grid = empty_grid(tn, gh, gw)
        if mesh is not None:
            from ..parallel.engine_shard import pin_cloud, pin_replicated
            self.cloud = pin_cloud(mesh, self.cloud)
            self.grid = pin_replicated(mesh, self.grid)
            self.scene = SceneData(
                cams=pin_replicated(mesh, scene.cams),
                pyr=pin_replicated(mesh, scene.pyr),
                images=scene.images, image_ids=scene.image_ids,
                visdata=pin_replicated(mesh, scene.visdata),
                distances=pin_replicated(mesh, scene.distances))
        self.log = log
        self.stats: list[dict] = []
        self.overflowed = False
        if tracer is None:
            from ..utils.trace import Tracer
            tracer = Tracer()
        self.tracer = tracer

    def _check_capacity(self, dropped: int = 0):
        """Surface patch-capacity pressure (VERDICT r1: overflow must be
        reported, not silent)."""
        cap = self.p_cap
        n = int(self.cloud.count())
        if dropped > 0:
            self.overflowed = True
            self.log(f"WARNING: patch capacity overflow: {dropped} "
                     f"accepted patches dropped (capacity {cap}); rerun "
                     f"with a larger p_cap")
        elif n > cap * 9 // 10:
            self.log(f"WARNING: patch cloud at {n}/{cap} "
                     f"(>90% capacity)")

    def _grow(self, new_cap: int):
        """Auto-grow the patch arrays (overflow recovery, VERDICT r2
        item 9): pad the cloud to `new_cap`; phases pick up the larger
        bucket automatically. Existing rows and grid indices keep their
        positions, so no state is invalidated."""
        old = self.cloud.capacity
        if new_cap <= old:
            return
        new_cap = _bucket(new_cap, 1 << 30)   # round up to a bucket size
        if self.mesh is not None:
            from ..parallel.engine_shard import round_capacity
            new_cap = round_capacity(new_cap, self.mesh)
        self.log(f"growing patch capacity {old} -> {new_cap}")
        big = empty_cloud(new_cap, self.cloud.max_views)
        self.cloud = jax.tree.map(
            lambda b, s: b.at[:old].set(s), big, self.cloud)
        self.p_cap = new_cap
        self._pin()

    def _pin(self):
        """Re-anchor state shardings after a phase (GSPMD may emit
        differently-laid-out outputs)."""
        if self.mesh is None:
            return
        from ..parallel.engine_shard import pin_cloud, pin_replicated
        self.cloud = pin_cloud(self.mesh, self.cloud)
        self.grid = pin_replicated(self.mesh, self.grid)

    # ---- active-prefix bucketing ----
    # Alive patches are kept in the array prefix (seed/expand append in
    # index order; after filters _compact re-packs), so each phase can
    # run on a power-of-two bucket slice instead of full capacity. Each
    # bucket size is one jit specialization per phase.
    def _cap_bucket(self, need: int) -> int:
        b = _bucket(need, self.p_cap)
        if self.mesh is not None:
            from ..parallel.engine_shard import round_capacity
            b = min(round_capacity(b, self.mesh), self.p_cap)
        return b

    def _slice(self, cap_b: int):
        if cap_b >= self.p_cap:
            return self.cloud
        return jax.tree.map(lambda a: a[:cap_b], self.cloud)

    def _paste(self, part, cap_b: int):
        if cap_b >= self.p_cap:
            self.cloud = part
        else:
            self.cloud = jax.tree.map(
                lambda full, pt: full.at[:cap_b].set(pt),
                self.cloud, part)
        self._pin()

    def _compact(self):
        """Re-pack alive rows to the prefix; remap grid.depth_idx."""
        from .patches import compact_cloud
        self.cloud, inv = compact_cloud(self.cloud)
        didx = self.grid.depth_idx
        self.grid = replace(
            self.grid,
            depth_idx=jnp.where(didx >= 0, inv[jnp.maximum(didx, 0)], -1))
        self._pin()

    def run(self, expand_iters: int = 3, max_waves: int = 12,
            refine_iters: int = 8, start_iter: int = 0,
            filters: bool = True) -> PatchCloud:
        """`start_iter > 0` resumes mid-reconstruction from checkpointed
        state (load_checkpoint): detect/seed are skipped and the
        expand/filter loop continues at that iteration with the
        thresholds the checkpoint carried (the reference has no live
        resume path at all - readPatches is never called,
        patchOrganizerS.cpp:134-205)."""
        if start_iter > 0:
            return self._run_iters(start_iter, expand_iters, max_waves,
                                   refine_iters, filters=filters)
        cams, pyr, cfg = self.scene.cams, self.scene.pyr, self.cfg
        tr = self.tracer
        t0 = time.time()

        # feature detection on the level-`level` images
        with tr.span("detect", block=True):
            lv = cfg.level
            h = int(np.asarray(pyr.heights[lv]).max())
            w = int(np.asarray(pyr.widths[lv]).max())
            x0 = int(pyr.xoff[lv])
            img = pyr.atlas[:, :h, x0:x0 + w, :]
            mask = pyr.mask_atlas[:, :h, x0:x0 + w] \
                * pyr.edge_atlas[:, :h, x0:x0 + w]
            feats = detect_features(img, mask, pyr.widths[lv],
                                    pyr.heights[lv], fcsize=16)
            nfeat = int(np.asarray(feats["valid"]).sum())
        tr.add_counter("detect", "features", nfeat)
        self.log(f"features: {nfeat} ({time.time() - t0:.1f}s)")

        ref_views, rv_valid = collect_images_all(
            cams, self.scene.visdata, self.scene.distances, cfg.tau,
            cfg.sequence)

        # ---- seed ----
        t1 = time.time()
        with tr.span("seed", block=True):
            def _ensure(needed: int):
                # pre-grow so no accepted seed can be dropped: one
                # extra commit at most, never a re-seed from scratch
                headroom = int(self.cloud.count()) + needed
                if headroom > self.p_cap:
                    self._grow(headroom)
                return self.cloud

            self.cloud, sdrop = run_seed(
                cams, pyr, cfg, self.thr, self.scene.visdata, feats,
                ref_views, rv_valid, self.cloud,
                refine_iters=refine_iters, ensure_capacity=_ensure)
            self._pin()
            nseed = int(self.cloud.count())
        tr.add_counter("seed", "patches", nseed)
        self.log(f"seed: {nseed} patches ({time.time() - t1:.1f}s)")
        self._check_capacity(int(sdrop))

        from .filter import refresh_visibility
        n_alive = int(self.cloud.count())
        cap_b = self._cap_bucket(n_alive)
        cb, self.grid = refresh_visibility(
            cams, pyr, cfg, self.thr, self._slice(cap_b), self.grid)
        self._paste(cb, cap_b)

        # ---- expand/filter iterations (findMatch.cpp:200-217) ----
        return self._run_iters(0, expand_iters, max_waves, refine_iters,
                               t0=t0, filters=filters)

    def _run_iters(self, start_iter: int, expand_iters: int,
                   max_waves: int, refine_iters: int,
                   t0: float | None = None,
                   filters: bool = True) -> PatchCloud:
        # `filters=False` skips the filter stage each iteration - used
        # by the oracle aggregate-equivalence tests to compare the raw
        # seed+expand semantics against the sequential reference walk
        cams, pyr, cfg = self.scene.cams, self.scene.pyr, self.cfg
        tr = self.tracer
        if t0 is None:
            t0 = time.time()
        if start_iter > 0:
            # resumed state: rebuild visibility for the loaded cloud
            from .filter import refresh_visibility
            cap_b = self._cap_bucket(int(self.cloud.count()))
            cb, self.grid = refresh_visibility(
                cams, pyr, cfg, self.thr, self._slice(cap_b), self.grid)
            self._paste(cb, cap_b)
        for it in range(start_iter, expand_iters):
            depth = it + 1
            t2 = time.time()
            frontier = self.cloud.alive
            total_new = 0
            total_vdrops = 0
            # one packed transfer for the wave-entry counts; inside the
            # loop both are carried forward from the commit stats (each
            # separate int(scalar) costs a full host round trip -
            # ~25 ms through this environment's TPU tunnel - and the
            # old code paid ~7 of them per wave)
            f_n, n_alive = map(int, np.asarray(jnp.stack([
                (frontier[:self.cloud.capacity]
                 & self.cloud.alive).sum(), self.cloud.count()])))
            for wave in range(max_waves):
                # ---- stage 1: discover (cheap) ----
                # gates + dedup run on the whole 6x frontier fan-out;
                # the host reads back only the surviving-candidate
                # count and sizes the expensive refine batch to it
                # (reference never refines gated-away proposals either,
                # expand.cpp:200-256)
                if f_n == 0:
                    break
                cap_d = self._cap_bucket(n_alive)
                fbudget = _bucket15(f_n, cap_d)
                if frontier.shape[0] < cap_d:
                    frontier = jnp.zeros(cap_d, bool).at[
                        :frontier.shape[0]].set(frontier)
                slack = 0 if depth <= 1 else 1
                with tr.span("expand", block=True):
                    disc = expand_discover(
                        cams, pyr, cfg, self.thr, self._slice(cap_d),
                        self.grid, frontier[:cap_d], slack, fbudget)
                    ncand, oflow_n = map(int, np.asarray(jnp.stack(
                        [disc.ncand, disc.overflow.sum()])))
                    if ncand == 0:
                        frontier = jnp.zeros(self.p_cap, bool).at[
                            :cap_d].set(disc.overflow)
                        f_n = oflow_n
                        if f_n == 0:
                            break
                        continue

                    # ---- stage 2: commit (refine batch = ncand) ----
                    # commit-batch cap: larger waves amortize the
                    # [cloud]-scale gather/scatter overhead of each
                    # commit (full-scene profile: refine is ~10% of
                    # commit time; 36 waves of <=32k candidates spent
                    # ~2.5 s/wave on fixed overhead). process chunking
                    # (PROCESS_CHUNK) bounds the texture memory, so the
                    # cap is free to be large.
                    cbudget = _bucket15(min(ncand, 98304), 98304)
                    if n_alive + cbudget > self.p_cap:
                        # auto-grow before successes can be dropped
                        self._grow(max(self.p_cap * 2,
                                       n_alive + cbudget))
                    cap_b = self._cap_bucket(n_alive + cbudget)
                    if cap_b != cap_d:
                        disc = disc._replace(overflow=jnp.zeros(
                            cap_b, bool).at[:cap_d].set(disc.overflow))
                    cb, self.grid, fr, st = expand_commit(
                        cams, pyr, cfg, self.thr, self.scene.visdata,
                        self._slice(cap_b), self.grid, disc, cbudget,
                        refine_iters=refine_iters)
                    self._paste(cb, cap_b)
                    frontier = jnp.zeros(self.p_cap, bool).at[
                        :cap_b].set(fr)
                    # ONE packed readback for all wave counters
                    acc, vdrops, dropped, frn = map(int, np.asarray(
                        jnp.stack([st.accepted, st.view_drops,
                                   st.dropped, fr.sum()])))
                total_new += acc
                total_vdrops += vdrops
                tr.add_counter("expand", "accepted", acc)
                tr.add_counter("expand", "candidates", ncand)
                self._check_capacity(dropped)
                self.log(f"  it{it} wave{wave}: +{acc} "
                         f"(cand {ncand}, batch {cbudget}, "
                         f"frontier {f_n}/{fbudget}, cap {cap_b})")
                f_n = frn
                n_alive = n_alive + acc
                if acc == 0 and frn == 0:
                    break
            self.log(f"expand it{it}: +{total_new} -> "
                     f"{int(self.cloud.count())} "
                     f"({time.time() - t2:.1f}s)")

            if not filters:
                self.thr = self.thr.relaxed()
                continue
            t3 = time.time()
            cap_b = self._cap_bucket(int(self.cloud.count()))
            with tr.span("filter", block=True):
                from .filter import (MAX_PAIRS_PER_PASS,
                                     count_neighbor_pairs,
                                     filter_neighbor_chunked,
                                     run_filters_post, run_filters_pre,
                                     run_filters_tail)
                cb, ngrid, fstats = run_filters_pre(
                    cams, pyr, cfg, self.thr, self._slice(cap_b),
                    self.grid)
                # size the neighbor pass to the exact pair count (a
                # one-scalar sync; blind budgets either waste the pass
                # or silently weaken it), clamped against HBM: above
                # MAX_PAIRS_PER_PASS the pass runs in row chunks with
                # identical verdicts and bounded transient memory
                need = int(count_neighbor_pairs(cfg, cb))
                if need > MAX_PAIRS_PER_PASS:
                    nb0 = int(cb.count())
                    cb, pdrop = filter_neighbor_chunked(
                        cams, cfg, self.thr, cb, need)
                    fstats["neighbor"] = (nb0, int(cb.count()))
                    cb, ngrid, fstats2 = run_filters_tail(
                        cams, pyr, cfg, self.thr, cb, ngrid)
                    pb = MAX_PAIRS_PER_PASS
                else:
                    pb = _bucket15(max(need, 1024), MAX_PAIRS_PER_PASS)
                    cb, ngrid, fstats2 = run_filters_post(
                        cams, pyr, cfg, self.thr, cb, ngrid, pb)
                    fstats2 = dict(fstats2)
                    pdrop = int(fstats2.pop("pairs_dropped")[0])
                fstats.update(fstats2)
                if pdrop:   # cannot happen with an exact count; guard
                    # chunked passes size their own exact per-chunk
                    # budgets, so only the single-pass branch has a
                    # meaningful budget to report
                    bmsg = "chunked exact budgets" \
                        if need > MAX_PAIRS_PER_PASS else f"budget {pb}"
                    self.log(f"WARNING: filterNeighbor dropped {pdrop} "
                             f"pairs ({bmsg})")
                self.grid = ngrid
                self._paste(cb, cap_b)
                self._compact()
            # ONE packed readback for the stats message + truncation
            # counters (each int(scalar) is a host round trip)
            flat = [v for pair in fstats.values() for v in pair]
            packed = np.asarray(jnp.stack(
                [jnp.asarray(v) for v in flat]
                + [jnp.maximum(self.grid.occ - cfg.cell_k, 0).sum(),
                   jnp.maximum(self.grid.vocc - cfg.cell_k, 0).sum()]))
            vals = [int(v) for v in packed]
            msg = ", ".join(
                f"{k} {vals[2 * i]}->{vals[2 * i + 1]}"
                for i, k in enumerate(fstats))
            self.log(f"filter it{it}: {msg} ({time.time() - t3:.1f}s)")
            # truncation observability (VERDICT r2 item 6): patches in
            # cells beyond the cell_k query fan-out, and views beyond
            # the t_store storage cap
            cell_trunc, vcell_trunc = vals[-2], vals[-1]
            if cell_trunc or vcell_trunc:
                self.log(f"  cell_k truncation: {cell_trunc} patches "
                         f"(pgrids) / {vcell_trunc} (vpgrids) beyond "
                         f"k={cfg.cell_k}")
            self.stats.append({"iter": it, "new": total_new,
                               "view_drops": total_vdrops,
                               "cell_trunc": cell_trunc,
                               "vcell_trunc": vcell_trunc,
                               **{k: (int(a), int(b))
                                  for k, (a, b) in fstats.items()}})

            self.thr = self.thr.relaxed()

        self.log(f"total: {int(self.cloud.count())} patches "
                 f"({time.time() - t0:.1f}s)")
        return self.cloud

    # ---- checkpoint / resume ----
    # The reference has only a latent, never-called resume path
    # (readPatches, patchOrganizerS.cpp:134-205). Here the full engine
    # state - patch tensor, grid, thresholds, phase counter - snapshots
    # to one npz so pod-scale runs can resume mid-reconstruction.
    def save_checkpoint(self, path: str, iteration: int = 0):
        import dataclasses
        arrays = {"iteration": np.asarray(iteration)}
        for f in dataclasses.fields(self.cloud):
            arrays[f"cloud_{f.name}"] = np.asarray(
                getattr(self.cloud, f.name))
        for f in dataclasses.fields(self.grid):
            arrays[f"grid_{f.name}"] = np.asarray(
                getattr(self.grid, f.name))
        for f in dataclasses.fields(self.thr):
            arrays[f"thr_{f.name}"] = np.asarray(getattr(self.thr, f.name))
        np.savez_compressed(path, **arrays)

    def load_checkpoint(self, path: str) -> int:
        import dataclasses
        data = np.load(path)
        self.cloud = type(self.cloud)(**{
            f.name: jnp.asarray(data[f"cloud_{f.name}"])
            for f in dataclasses.fields(self.cloud)})
        self.grid = type(self.grid)(**{
            f.name: jnp.asarray(data[f"grid_{f.name}"])
            for f in dataclasses.fields(self.grid)})
        self.thr = type(self.thr)(**{
            f.name: jnp.asarray(data[f"thr_{f.name}"])
            for f in dataclasses.fields(self.thr)})
        self.p_cap = self.cloud.capacity
        return int(data["iteration"])

    # ---- output (reference patchOrganizerS.cpp:89-132, 687-779) ----
    def write(self, prefix: str, ply=True, patch=True, pset=True):
        from ..io.patches import PatchRecord, write_patch_file, write_pset
        from ..io.ply import write_patch_ply
        from ..image.sample import bilinear_color

        cloud = self.cloud
        alive = np.asarray(cloud.alive)
        idx = np.nonzero(alive)[0]
        coord = np.asarray(cloud.coord)[idx]
        normal = np.asarray(cloud.normal)[idx]
        ncc = np.asarray(cloud.ncc)[idx]
        images = np.asarray(cloud.images)[idx]
        vimages = np.asarray(cloud.vimages)[idx]
        dscale = np.asarray(cloud.dscale)[idx]
        ascale = np.asarray(cloud.ascale)[idx]

        if ply:
            colors = self._patch_colors(idx)
            write_patch_ply(prefix + ".ply", coord[:, :3], normal[:, :3],
                            colors=colors, quality=ncc)
        if pset:
            write_pset(prefix + ".pset", coord[:, :3], normal[:, :3])
        if patch:
            ids = self.scene.image_ids
            recs = []
            for k in range(len(idx)):
                imgs = [ids[i] for i in images[k] if i >= 0]
                vimgs = [ids[i] for i in vimages[k] if i >= 0]
                recs.append(PatchRecord(
                    coord=coord[k], normal=normal[k], ncc=float(ncc[k]),
                    dscale=float(dscale[k]), ascale=float(ascale[k]),
                    images=imgs, vimages=vimgs))
            write_patch_file(prefix + ".patch", recs)

    def _patch_colors(self, idx) -> np.ndarray:
        """Mean projected color over a patch's images
        (patchOrganizerS.cpp:722-734)."""
        from ..image.sample import bilinear_color
        cloud, cams, pyr = self.cloud, self.scene.cams, self.scene.pyr
        lv = self.cfg.level
        coord = cloud.coord[idx]
        imgs = cloud.images[idx]
        ok = imgs >= 0
        vid = jnp.maximum(imgs, 0)
        ic = project(cams.P[vid], coord[:, None, :], lv)
        col = bilinear_color(pyr, vid, jnp.full_like(vid, lv),
                             ic[..., 0], ic[..., 1])
        col = jnp.where(ok[..., None], col, 0.0)
        denom = jnp.maximum(ok.sum(axis=1), 1)
        return np.asarray(col.sum(axis=1) / denom[:, None])


def reconstruct(prefix: str, option_name: str, p_cap: int = 200_000,
                log=print, profile_dir: str | None = None, **run_kwargs):
    """pmvs3-equivalent entry: load, run, write models/<option>
    (reference source/pmvs.cpp:7-63). `profile_dir` captures an xprof
    trace of the whole run (utils/trace.Tracer)."""
    from ..utils.trace import Tracer
    opt = PMVSOptions.parse(os.path.join(prefix, option_name))
    scene = load_scene(prefix, opt)
    tracer = Tracer(profile_dir=profile_dir)
    engine = PMVSEngine(scene, opt, p_cap=p_cap, log=log, tracer=tracer)
    with tracer.trace():
        engine.run(**run_kwargs)
    out = os.path.join(prefix, "models", option_name)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    engine.write(out)
    tracer.write(out + ".trace.json")
    log(tracer.summary())
    return engine
