"""End-to-end reconstruction of the occluded multi-object scene.

This is the acceptance test the plane scene cannot provide
(VERDICT round 1): occlusions and depth discontinuities produce real
outliers, so filterOutside/filterExact/filterSmallGroups
(reference source/pmvs/filter.cpp:29-355) do real work here.
"""
import os

import numpy as np
import pytest

from cmvs_pmvs_tpu.models.engine import reconstruct
from cmvs_pmvs_tpu.utils.synthetic import make_occluded_scene, write_pmvs_tree


@pytest.fixture(scope="module")
def recon(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("occl"))
    scene = make_occluded_scene(num_cameras=8, width=160, height=120,
                                focal=220.0)
    write_pmvs_tree(scene, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
                "CPU 4\nsetEdge 0\nuseBound 0\nuseVisData 0\nsequence -1\n"
                "timages -1 0 8\noimages 0\n")
    eng = reconstruct(root, "option.txt", p_cap=12000, expand_iters=1,
                      max_waves=2, refine_iters=8, log=lambda *a: None)
    return scene, eng


def test_occluded_accuracy(recon):
    scene, eng = recon
    alive = np.asarray(eng.cloud.alive)
    assert alive.sum() > 400, alive.sum()
    coord = np.asarray(eng.cloud.coord)[alive][:, :3]
    dscale = np.asarray(eng.cloud.dscale)[alive]
    d = scene.surface_distance(coord) / dscale
    # most patches lie on a true surface despite the occlusions
    assert np.median(d) < 0.4, np.median(d)
    assert np.quantile(d, 0.9) < 1.5, np.quantile(d, 0.9)


def test_occluded_multi_surface(recon):
    """Patches land on the boxes, not just the ground plane."""
    scene, eng = recon
    alive = np.asarray(eng.cloud.alive)
    coord = np.asarray(eng.cloud.coord)[alive][:, :3]
    elevated = (coord[:, 2] > 0.1).sum()
    assert elevated > 50, elevated


def test_filters_prune_outliers(recon):
    """The filter stage removed something (real outliers exist here)."""
    _, eng = recon
    removed = 0
    for st in eng.stats:
        for k in ("outside", "exact", "neighbor", "groups"):
            if k in st:
                a, b = st[k]
                removed += a - b
    assert removed > 0, eng.stats
