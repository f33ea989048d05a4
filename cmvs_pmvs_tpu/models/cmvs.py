"""CMVS view clustering: the pod-scale partitioner.

Port of CBundle (reference source/cmvs/bundle.cpp, CVPR-2010 CMVS): given
Bundler SfM output, compress SfM points, drop redundant images, split the
remainder into overlapping clusters of <= maximage views, and grow
clusters until every image's points are covered. Outputs ske.dat /
vis.dat / centers-*.ply consumed by genOption + the PMVS engine.

Replacements for vendored third-party code (SURVEY.md section 2.3):
  * STANN z-order kNN        -> scipy cKDTree (host-side, build-time)
  * Graclus MLKKM normalized cut -> spectral bisection by the Fiedler
    vector of the normalized Laplacian (quality matched on cluster-size
    and coverage metrics, not cut-identical)
  * the fork's broken CDisjointSet (unconditional throw,
    disjoint.hpp:117-125) -> a correct union-find

The decision loops are host-side Python/numpy (they are sequential greedy
choices over <=hundreds of images); the scoring kernel computeScore2 is
vectorized per point.
"""
from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import numpy as np

from ..io.bundler import BundleData, read_bundle
from ..io.cameras import read_camera_txt
from ..io.ske import write_ske
from ..io.visdata import write_vis

LSIGMA = 5.0 * math.pi / 180.0
RSIGMA = 15.0 * math.pi / 180.0
PIVOT = 20.0 * math.pi / 180.0


class UnionFind:
    """Union-find with path compression (replaces the fork's broken
    CDisjointSet, reference include/cmvs/disjoint.hpp)."""

    def __init__(self, n: int):
        self.parent = np.arange(n)

    def find(self, x: int) -> int:
        root = x
        p = self.parent
        while p[root] != root:
            root = p[root]
        while p[x] != root:
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[max(ra, rb)] = min(ra, rb)


def angle_score(cos_angle):
    """Gaussian band-pass around a 20-degree pair angle
    (reference bundle.cpp:956-971)."""
    angle = np.arccos(np.minimum(1.0, cos_angle))
    diff = angle - PIVOT
    sig2 = np.where(angle < PIVOT, 2.0 * LSIGMA * LSIGMA,
                    2.0 * RSIGMA * RSIGMA)
    return np.exp(-diff * diff / sig2)


@dataclass
class CmvsProblem:
    coords: np.ndarray         # [P, 3]
    visibles: list[list[int]]  # per point, sorted image ids
    centers: np.ndarray        # [C, 3] optical centers
    ipscales: np.ndarray       # [C] (|P0|+|P1|)/2 for getScale
    widths: np.ndarray         # [C] full-res widths
    heights: np.ndarray        # [C]
    dlevel: int = 7            # SfM resolution level (bundle.cpp:65-66)

    @property
    def cnum(self) -> int:
        return len(self.centers)

    def get_scale(self, coord: np.ndarray, images: np.ndarray,
                  level: int = 0) -> np.ndarray:
        """Pixel footprint of the images at coord
        (reference camera.cpp:178-194)."""
        ray = coord[None, :] - self.centers[images]
        return (np.linalg.norm(ray, axis=1) * (1 << level)
                / self.ipscales[images])


class CmvsClustering:
    """The full clustering pipeline (reference CBundle::run,
    bundle.cpp:120-171)."""

    def __init__(self, prob: CmvsProblem, maximage: int, tau: int = 4,
                 score_ratio: float = 0.7, coverage: float = 0.7,
                 log=print):
        self.prob = prob
        self.maximage = maximage
        self.tau = tau
        self.score_ratio = score_ratio
        self.coverage = coverage
        self.log = log
        self.coords = prob.coords.copy()
        self.visibles = [list(v) for v in prob.visibles]
        self.pweights = np.ones(len(self.coords))
        self.removed = np.zeros(prob.cnum, dtype=bool)
        self.timages: list[list[int]] = []
        self.oimages: list[list[int]] = []

    # ---- scoring (bundle.cpp:1248-1325) ----
    def compute_score2(self, coord, images) -> tuple[float, list[int]]:
        """Greedy tau-subset score: best pair by angleScore x inverse
        footprints, then greedily extend. Returns (score, uimages)."""
        images = np.asarray(images)
        inum = len(images)
        if inum < 2:
            return -1.0, []
        rays = self.prob.centers[images] - coord[None, :]
        rays = rays / np.linalg.norm(rays, axis=1, keepdims=True)
        scales = 1.0 / self.prob.get_scale(coord, images)
        cosm = rays @ rays.T
        pair = angle_score(cosm) * scales[:, None] * scales[None, :]
        np.fill_diagonal(pair, -np.inf)
        i, j = np.unravel_index(np.argmax(pair), pair.shape)
        chosen = [int(i), int(j)]
        best = pair[i, j]
        in_set = np.zeros(inum, bool)
        in_set[[i, j]] = True
        for _ in range(2, min(self.tau, inum)):
            gains = pair[:, chosen].sum(axis=1)
            gains[in_set] = -np.inf
            k = int(np.argmax(gains))
            in_set[k] = True
            chosen.append(k)
            best += gains[k]
        return float(best), [int(images[c]) for c in chosen]

    def set_score_thresholds(self):
        """scoreThreshold = full-visibility score x lambda
        (bundle.cpp:227-232)."""
        p = len(self.coords)
        self.score_thresholds = np.empty(p)
        self.uimages: list[list[int]] = [None] * p
        for i in range(p):
            s, u = self.compute_score2(self.coords[i], self.visibles[i])
            self.score_thresholds[i] = s * self.score_ratio
            self.uimages[i] = u
        self.satisfied = np.ones(p, dtype=np.int8)

    # ---- vpoints / neighbors (bundle.cpp:410-432) ----
    def set_vpoints(self):
        self.vpoints: list[list[int]] = [[] for _ in range(self.prob.cnum)]
        for pid, vis in enumerate(self.visibles):
            for c in vis:
                self.vpoints[c].append(pid)

    def set_neighbors(self):
        cnum = self.prob.cnum
        neighbors = [set() for _ in range(cnum)]
        for vis in self.visibles:
            for a in vis:
                neighbors[a].update(vis)
        self.neighbors = [sorted(s - {c}) for c, s in enumerate(neighbors)]

    def compute_link(self, i0: int, i1: int) -> float:
        """Link weight = sum of normalized pair scores over shared points
        (bundle.cpp:173-190)."""
        common = set(self.vpoints[i0]) & set(self.vpoints[i1])
        score = 0.0
        for pid in common:
            s, _ = self.compute_score2(self.coords[pid], [i0, i1])
            thr = self.score_thresholds[pid]
            if thr != 0.0:
                score += self.pweights[pid] * s / (thr / self.score_ratio)
        return score

    def slim_neighbors_set_links(self, maxneighbor: int = 30):
        """Cap neighbor lists at the 30 strongest links
        (bundle.cpp:192-225)."""
        self.links: list[list[float]] = []
        for c in range(self.prob.cnum):
            ls = [self.compute_link(c, n) for n in self.neighbors[c]]
            if len(self.neighbors[c]) >= 2:
                order = sorted(range(len(ls)),
                               key=lambda k: (-ls[k], self.neighbors[c][k]))
                order = order[:maxneighbor]
                self.neighbors[c] = [self.neighbors[c][k] for k in order]
                ls = [ls[k] for k in order]
            self.links.append(ls)

    # ---- point compression (bundle.cpp:638-889) ----
    def _neighbor_candidates(self, min_scales) -> list[list[int]]:
        """Per-point merge candidates within min(r_i, r_j) (reference
        findPNeighbors, bundle.cpp:638-667). Uses the native Morton-order
        scan when built, scipy cKDTree otherwise."""
        p = len(self.coords)
        adj: list[list[int]] = [[] for _ in range(p)]
        try:
            from .. import _native
            flat = _native.radius_pairs(
                np.ascontiguousarray(self.coords, np.float32),
                np.ascontiguousarray(min_scales, np.float32))
            for k in range(0, len(flat), 2):
                i, j = flat[k], flat[k + 1]
                d = np.linalg.norm(self.coords[i] - self.coords[j])
                if d <= min_scales[i] and d <= min_scales[j]:
                    adj[i].append(j)
                    adj[j].append(i)
            return adj
        except ImportError:
            pass
        from scipy.spatial import cKDTree
        tree = cKDTree(self.coords)
        for pid in range(p):
            for pid2 in tree.query_ball_point(self.coords[pid],
                                              min_scales[pid]):
                if pid2 != pid:
                    d = np.linalg.norm(self.coords[pid2]
                                       - self.coords[pid])
                    if d <= min_scales[pid2]:
                        adj[pid].append(pid2)
        return adj

    def merge_sfm_points(self):
        p = len(self.coords)
        min_scales = np.full(p, np.inf)
        for pid in range(p):
            imgs = np.asarray(self.visibles[pid])
            s = self.prob.get_scale(self.coords[pid], imgs,
                                    self.prob.dlevel)
            min_scales[pid] = s.min()

        adj = self._neighbor_candidates(min_scales)
        uf = UnionFind(p)
        merged = np.zeros(p, bool)
        order = np.random.default_rng(42).permutation(p)
        nsets = [set(n) for n in self.neighbors]
        for pid in order:
            if merged[pid]:
                continue
            vis = set(self.visibles[pid])
            for im in self.visibles[pid]:
                vis.update(nsets[im])
            merged[pid] = True
            for pid2 in adj[pid]:
                if merged[pid2]:
                    continue
                if vis & set(self.visibles[pid2]):
                    merged[pid2] = True
                    uf.union(pid, pid2)

        # compress components with >= 2 members (bundle.cpp:834-868)
        roots = np.array([uf.find(i) for i in range(p)])
        counts = np.bincount(roots, minlength=p)
        keep_roots = np.nonzero(counts >= 2)[0]
        root_map = {int(r): i for i, r in enumerate(keep_roots)}
        newp = len(keep_roots)
        newcoords = np.zeros((newp, 3))
        newweights = np.zeros(newp)
        newvis: list[set] = [set() for _ in range(newp)]
        for pid in range(p):
            r = roots[pid]
            if counts[r] < 2:
                continue
            k = root_map[int(r)]
            newcoords[k] += self.coords[pid]
            newweights[k] += 1
            newvis[k].update(self.visibles[pid])
        self.coords = newcoords / newweights[:, None]
        self.visibles = [sorted(v) for v in newvis]
        self.pweights = newweights
        self.log(f"mergeSfMP: {p} -> {newp} points")

    # ---- greedy image removal (bundle.cpp:234-408) ----
    def remove_images(self):
        cnum = self.prob.cnum
        self.set_vpoints()
        allows = np.array([
            math.ceil(len(self.vpoints[c]) * (1.0 - self.coverage))
            for c in range(cnum)])
        order = sorted(range(cnum), key=lambda c: (
            self.prob.widths[c] * self.prob.heights[c], c))
        for image in order:
            self._check_image(image, allows)
        kept = int((~self.removed).sum())
        self.log(f"sRemoveImages: {cnum} -> {kept}")

    def _check_image(self, image: int, allows: np.ndarray):
        stats = {}
        for pid in self.vpoints[image]:
            if self.satisfied[pid] == 0:
                stats[pid] = 0
                continue
            stats[pid] = 1
            u = self.uimages[pid]
            valid = all(not self.removed[i] for i in u)
            inside = image in u
            if valid and not inside:
                continue
            newimages = [i for i in self.visibles[pid]
                         if not self.removed[i] and i != image]
            s, _ = self.compute_score2(self.coords[pid], newimages)
            if s < self.score_thresholds[pid]:
                stats[pid] = 2

        decrements = np.zeros(self.prob.cnum, dtype=np.int64)
        for pid, st in stats.items():
            if st == 2:
                for i in self.visibles[pid]:
                    decrements[i] += 1
        if np.any(allows < decrements):
            return
        self.removed[image] = True
        allows -= decrements
        for pid, st in stats.items():
            if st == 2:
                self.satisfied[pid] = 0
            elif st == 1 and image in self.uimages[pid]:
                newimages = [i for i in self.visibles[pid]
                             if not self.removed[i]]
                s, u = self.compute_score2(self.coords[pid], newimages)
                self.uimages[pid] = u
                if s < self.score_thresholds[pid]:
                    self.satisfied[pid] = 0

    def reset_visibles(self):
        self.visibles = [
            [i for i in vis if not self.removed[i]]
            for vis in self.visibles]

    # ---- partitioning (bundle.cpp:434-539; Graclus -> spectral) ----
    def divide_images(self, images: list[int]) -> list[list[int]]:
        iratio = 125.0 / 150.0
        out: list[list[int]] = []
        queue = [list(images)]
        while queue:
            cand = queue.pop(0)
            if len(cand) <= self.maximage * iratio:
                out.append(cand)
                continue
            g1, g2 = self._bisect(cand)
            for g in (g1, g2):
                if len(g) <= self.maximage * iratio:
                    out.append(g)
                else:
                    queue.append(g)
        return out

    def _bisect(self, cand: list[int]) -> tuple[list[int], list[int]]:
        """Spectral bisection with the same edge weights the reference
        feeds Graclus: min(5000, round(10 * link)) (bundle.cpp:494-505)."""
        n = len(cand)
        pos = {c: i for i, c in enumerate(cand)}
        W = np.zeros((n, n))
        for i, c in enumerate(cand):
            for nb, link in zip(self.neighbors[c], self.links[c]):
                j = pos.get(nb)
                if j is not None and j != i:
                    W[i, j] = min(5000.0, math.floor(10.0 * link + 0.5))
        W = np.maximum(W, W.T)
        d = W.sum(axis=1)
        d = np.where(d == 0.0, 1.0, d)
        dm = 1.0 / np.sqrt(d)
        L = np.eye(n) - dm[:, None] * W * dm[None, :]
        vals, vecs = np.linalg.eigh(L)
        fiedler = vecs[:, 1] * dm
        med = np.median(fiedler)
        side = fiedler > med
        # break ties so neither side is empty
        if side.all() or (~side).all():
            side = np.zeros(n, bool)
            side[np.argsort(fiedler)[n // 2:]] = True
        g1 = [cand[i] for i in range(n) if not side[i]]
        g2 = [cand[i] for i in range(n) if side[i]]
        return g1, g2

    # ---- cluster growth (bundle.cpp:973-1164) ----
    def _set_cluster(self, pid: int):
        best_score, best_cluster = -1.0, -1
        vis = set(self.visibles[pid])
        for c, tset in enumerate(self._tsets):
            inter = sorted(vis & tset)
            s, _ = self.compute_score2(self.coords[pid], inter)
            if s > best_score:
                best_score, best_cluster = s, c
        if best_cluster == -1:
            for j in self.visibles[pid]:
                for c, tset in enumerate(self._tsets):
                    if j in tset:
                        best_cluster, best_score = c, 0.0
                        break
                if best_cluster != -1:
                    break
        self.cluster[pid] = best_cluster
        self.cscore[pid] = best_score
        if best_score >= self.score_thresholds[pid]:
            self.satisfied[pid] = 1
            for im in self.visibles[pid]:
                self.lacks[im] -= 1

    def add_images_p(self):
        cnum = self.prob.cnum
        self.set_vpoints()
        self.lacks = np.array([
            0 if self.removed[c]
            else math.floor(len(self.vpoints[c]) * self.coverage)
            for c in range(cnum)], dtype=np.int64)

        p = len(self.coords)
        self.cluster = np.full(p, -1, dtype=np.int64)
        self.cscore = np.full(p, -1.0)
        self._tsets = [set(t) for t in self.timages]
        # setScoresClusters (bundle.cpp:889-899)
        for pid in range(p):
            if self.satisfied[pid] == 0:
                continue
            self.satisfied[pid] = 2
            self._set_cluster(pid)

        for _ in range(200):   # safety cap; reference loops unboundedly
            total = self._add_images()
            if total == 0:
                break
            if any(len(t) > self.maximage for t in self.timages):
                break
            self._tsets = [set(t) for t in self.timages]
            for pid in range(p):
                if self.satisfied[pid] == 2:
                    self._set_cluster(pid)

    def _add_images(self) -> int:
        """One greedy round of coverage repair
        (bundle.cpp:1043-1164)."""
        p = len(self.coords)
        flags = np.zeros(p, bool)
        for c in range(self.prob.cnum):
            if self.lacks[c] <= 0:
                continue
            for pid in self.vpoints[c]:
                if self.satisfied[pid] == 2:
                    flags[pid] = True

        cands: list[dict] = [dict() for _ in self.timages]
        for pid in np.nonzero(flags)[0]:
            cl = int(self.cluster[pid])
            if cl < 0:
                continue
            tset = self._tsets[cl]
            cimages = sorted(set(self.visibles[pid]) & tset)
            for image in self.visibles[pid]:
                if image in tset:
                    continue
                s, _ = self.compute_score2(self.coords[pid],
                                           cimages + [image])
                if s <= self.cscore[pid]:
                    continue
                gain = (s - self.cscore[pid]) / self.score_thresholds[pid]
                cands[cl][image] = cands[cl].get(image, 0.0) + gain

        cands2 = [(-g, c, im) for c, m in enumerate(cands)
                  for im, g in m.items()]
        if not cands2:
            return 0
        cands2.sort()
        gain_threshold = -cands2[0][0] * 0.9
        blocked = np.zeros(self.prob.cnum, bool)
        added = 0
        for negg, cl, image in cands2:
            if -negg < gain_threshold:
                break
            if blocked[image]:
                continue
            added += 1
            blocked[image] = True
            for nb in self.neighbors[image]:
                blocked[nb] = True
            self.timages[cl].append(image)
        for t in self.timages:
            t.sort()
        return added

    # ---- full pipeline ----
    def run(self):
        self.set_vpoints()
        self.set_neighbors()
        self.set_score_thresholds()
        self.slim_neighbors_set_links()
        self.merge_sfm_points()
        self.set_vpoints()
        self.set_score_thresholds()
        self.remove_images()
        self.reset_visibles()
        self.set_vpoints()
        self.set_neighbors()
        self.slim_neighbors_set_links()

        # initial mutually exclusive clusters (bundle.cpp:434-455)
        lhs = [c for c in range(self.prob.cnum) if not self.removed[c]]
        if len(lhs) <= self.maximage:
            self.timages = [lhs]
        else:
            self.timages = self.divide_images(lhs)
        self.log("cluster sizes: "
                 + " ".join(str(len(t)) for t in self.timages))

        for _ in range(50):    # safety cap; reference loops unboundedly
            self.add_images_p()
            change = False
            newt: list[list[int]] = []
            for t in self.timages:
                if len(t) <= self.maximage:
                    newt.append(t)
                else:
                    change = True
                    newt.extend(self.divide_images(t))
            self.timages = newt
            if not change:
                break
        self.oimages = [[] for _ in self.timages]
        self.log("final clusters: "
                 + " ".join(str(len(t)) for t in self.timages))

    def write(self, prefix: str):
        write_vis(os.path.join(prefix, "vis.dat"), [
            [] if self.removed[c] else self.neighbors[c]
            for c in range(self.prob.cnum)])
        write_ske(os.path.join(prefix, "ske.dat"), self.prob.cnum,
                  self.timages, self.oimages)
        from ..io.ply import write_patch_ply
        for i, t in enumerate(self.timages):
            pts = self.prob.centers[t]
            with open(os.path.join(prefix, "centers-%04d.ply" % i),
                      "w") as f:
                f.write("ply\nformat ascii 1.0\n"
                        f"element vertex {len(pts)}\n"
                        "property float x\nproperty float y\n"
                        "property float z\nend_header\n")
                for c in pts:
                    f.write(f"{c[0]} {c[1]} {c[2]}\n")


def load_problem(prefix: str) -> CmvsProblem:
    """Read bundle.rd.out + txt cameras + image dims
    (reference CBundle::prep, bundle.cpp:35-72)."""
    bundle = read_bundle(os.path.join(prefix, "bundle.rd.out"))
    cnum = bundle.num_cameras
    centers = np.zeros((cnum, 3))
    ipscales = np.zeros(cnum)
    widths = np.zeros(cnum, dtype=np.int64)
    heights = np.zeros(cnum, dtype=np.int64)
    from ..io.images import find_image_path
    from PIL import Image
    for c in range(cnum):
        P = read_camera_txt(os.path.join(prefix, "txt", "%08d.txt" % c))
        centers[c] = np.linalg.solve(P[:, :3], -P[:, 3])
        ipscales[c] = (np.linalg.norm(P[0, :3])
                       + np.linalg.norm(P[1, :3])) / 2.0
        path = find_image_path(os.path.join(prefix, "visualize"), c)
        if path is None:
            raise FileNotFoundError(f"missing image {c}")
        with Image.open(path) as im:
            widths[c], heights[c] = im.size
    # The reference hardcodes dlevel=7 assuming ~2Mpix SfM images
    # (bundle.cpp:65-66, "SfM was done on 2M pixels": 128px blocks on a
    # ~1600px-wide image). Scale the block size with actual resolution so
    # small scenes don't merge everything into one point.
    mean_w = float(widths.mean()) if cnum else 1600.0
    dlevel = int(np.clip(round(math.log2(max(mean_w / 16.0, 1.0))), 0, 12))
    return CmvsProblem(coords=bundle.coords, visibles=bundle.visibles,
                       centers=centers, ipscales=ipscales, widths=widths,
                       heights=heights, dlevel=dlevel)


def run_cmvs(prefix: str, maximage: int = 100, tau: int = 4,
             score_ratio: float = 0.7, coverage: float = 0.7,
             log=print) -> CmvsClustering:
    """cmvs3-equivalent entry (reference source/cmvs.cpp:7-59)."""
    prob = load_problem(prefix)
    c = CmvsClustering(prob, maximage, tau, score_ratio, coverage, log=log)
    c.run()
    c.write(prefix)
    return c
