"""CMVS clustering on a synthetic multi-camera scene."""
import os

import numpy as np
import pytest

from cmvs_pmvs_tpu.io.ske import read_ske
from cmvs_pmvs_tpu.io.visdata import read_vis
from cmvs_pmvs_tpu.models.cmvs import (
    CmvsClustering, angle_score, load_problem, run_cmvs,
)
from cmvs_pmvs_tpu.models.gen_option import gen_option
from cmvs_pmvs_tpu.utils.options import PMVSOptions
from cmvs_pmvs_tpu.utils.synthetic import (
    make_plane_scene, write_bundle_file, write_pmvs_tree,
)


@pytest.fixture(scope="module")
def cluster_run(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("cmvs"))
    scene = make_plane_scene(num_cameras=12, width=160, height=120,
                             ring_radius=1.5)
    write_pmvs_tree(scene, root)
    write_bundle_file(scene, root, num_points=300)
    c = run_cmvs(root, maximage=3, log=lambda *a: None)
    return scene, c, root


def test_angle_score_peak():
    import math
    # peaks at the 20-degree pivot, decays both ways
    s20 = angle_score(np.cos(np.deg2rad(20.0)))
    s5 = angle_score(np.cos(np.deg2rad(5.0)))
    s60 = angle_score(np.cos(np.deg2rad(60.0)))
    assert s20 > 0.999
    assert s5 < s20 and s60 < s20


def test_compute_score2_prefers_good_baselines(cluster_run):
    scene, c, _ = cluster_run
    coord = np.zeros(3)
    # wide selection scores at least as high as a near-duplicate pair
    s_all, u = c.compute_score2(coord, list(range(12)))
    s_narrow, _ = c.compute_score2(coord, [0, 1])
    assert s_all >= s_narrow
    assert len(u) == min(4, 12)


def test_clusters_cover_and_bound(cluster_run):
    scene, c, root = cluster_run
    inum, timages, oimages = read_ske(os.path.join(root, "ske.dat"))
    assert inum == 12
    assert len(timages) >= 2
    for t in timages:
        assert 0 < len(t) <= 3
    # every kept image appears in exactly one cluster
    # (initial clusters are mutually exclusive; growth adds overlap)
    all_imgs = [i for t in timages for i in t]
    kept = set(np.nonzero(~c.removed)[0])
    assert kept <= set(all_imgs)


def test_vis_dat_written(cluster_run):
    scene, c, root = cluster_run
    vis = read_vis(os.path.join(root, "vis.dat"))
    assert len(vis) == 12
    lens = [len(v) for v in vis]
    assert max(lens) > 0


def test_gen_option_pipeline(cluster_run):
    scene, c, root = cluster_run
    names = gen_option(root, level=0, csize=2)
    assert len(names) == len(c.timages)
    opt = PMVSOptions.parse(os.path.join(root, names[0]))
    assert opt.timages == sorted(c.timages[0])
    assert os.path.exists(os.path.join(root, "pmvs.sh"))
