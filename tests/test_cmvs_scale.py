"""CMVS at maximage scale: throughput + cluster-quality acceptance.

The stated quality bar for the Graclus/score-loop replacements
(SURVEY.md stage 4, reference bundle.cpp guarantees): cluster sizes
<= maximage, and coverage delta of the SfM points >= the configured
ratio. Also asserts batched score2 == the scalar reference
implementation on random subsets.
"""
import time

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cmvs_pmvs_tpu.models.cmvs import (
    CmvsClustering, CmvsProblem, pad_lists, score2_batch)


def make_bundle(n_cams=300, n_pts=30_000, seed=7,
                vis_window=(0.15, 0.5)):
    """Cameras on a ring looking at a noisy point sphere."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, n_cams, endpoint=False)
    centers = np.stack([6.0 * np.cos(ang), 6.0 * np.sin(ang),
                        rng.normal(0, 0.5, n_cams)], axis=1)
    ipscales = np.full(n_cams, 800.0)
    pts = rng.normal(0, 1.0, (n_pts, 3))
    # visibility: cameras within an angular window of each point
    pang = np.arctan2(pts[:, 1], pts[:, 0])
    diff = np.abs((pang[:, None] - ang[None] + np.pi)
                  % (2 * np.pi) - np.pi)
    vis = diff < rng.uniform(*vis_window, (n_pts, 1))
    visibles = []
    keep = []
    for i in range(n_pts):
        v = np.nonzero(vis[i])[0]
        if len(v) >= 2:
            visibles.append(v.tolist())
            keep.append(i)
    return CmvsProblem(
        coords=pts[keep], visibles=visibles, centers=centers,
        ipscales=ipscales, widths=np.full(n_cams, 640),
        heights=np.full(n_cams, 480), dlevel=5)


@pytest.fixture(scope="module")
def big_run():
    prob = make_bundle()
    c = CmvsClustering(prob, maximage=40, log=lambda *a: None)
    t0 = time.time()
    c.run()
    return prob, c, time.time() - t0


def test_batched_score2_matches_scalar(big_run):
    prob, c, _ = big_run
    rng = np.random.default_rng(3)
    rows = rng.choice(len(c.coords), 64, replace=False)
    vis_pad = pad_lists(c.visibles)
    sc, _ = score2_batch(prob.centers, prob.ipscales, c.coords[rows],
                         vis_pad[rows], c.tau)
    for k, pid in enumerate(rows):
        s_ref, _ = c.compute_score2(c.coords[pid], c.visibles[pid])
        assert sc[k] == pytest.approx(s_ref, rel=2e-4)


def test_cluster_sizes_bounded(big_run):
    _, c, _ = big_run
    assert len(c.timages) >= 2
    for t in c.timages:
        assert 0 < len(t) <= c.maximage


def test_point_coverage(big_run):
    """Most merged SfM points reach their score threshold inside one
    cluster (the reference's coverage-delta repair loop guarantee,
    bundle.cpp:973-1164)."""
    prob, c, _ = big_run
    vis_pad = pad_lists(c.visibles)
    img = np.maximum(vis_pad, 0)
    member = c._member_matrix()
    p = len(c.coords)
    best = np.full(p, -1.0)
    rows = np.arange(p)
    for cl in range(len(c.timages)):
        valid = (vis_pad >= 0) & member[img, cl]
        sc, _ = c._score2_rows(rows, valid=valid)
        best = np.maximum(best, sc)
    covered = (best >= c.score_thresholds).mean()
    assert covered > 0.7, covered


def test_runtime_budget(big_run):
    _, _, dt = big_run
    # VERDICT item 5 acceptance: hundreds of cameras / tens of
    # thousands of points in well under a minute of host time
    # (~25 s alone on this 2-vCPU box; the bound leaves headroom for
    # full-suite contention - the scalar-loop version took hours)
    assert dt < 150.0, dt


def test_uncached_pair_path_matches():
    """Bundles beyond PAIR_CACHE_BYTES recompute pair matrices on
    demand; the uncached path must give identical clusterings."""
    prob = make_bundle(n_cams=120, n_pts=4000, seed=11)
    a = CmvsClustering(prob, maximage=30, log=lambda *a: None)
    a.run()
    b = CmvsClustering(prob, maximage=30, log=lambda *a: None)
    b.PAIR_CACHE_BYTES = 0          # force the recompute path
    b.run()
    assert b._pair is None and a._pair is not None
    assert [sorted(t) for t in a.timages] == [sorted(t)
                                              for t in b.timages]


def test_config5_scale():
    """VERDICT r2 item 10: 1,000 cameras / 100k points complete in
    well under 5 minutes of host time with bounded cluster sizes
    (measured 87 s on this 2-vCPU box; bound leaves contention room)."""
    prob = make_bundle(n_cams=1000, n_pts=100_000, seed=7,
                       vis_window=(0.04, 0.12))
    c = CmvsClustering(prob, maximage=50, log=lambda *a: None)
    t0 = time.time()
    c.run()
    dt = time.time() - t0
    assert dt < 280.0, dt
    assert len(c.timages) >= 2
    for t in c.timages:
        assert 0 < len(t) <= c.maximage
