"""useBound / bimages.dat: reconstruction restricted to a bounding view.

Reference: option.cpp:301-324 (initBindexes), findMatch.cpp:109-118
(insideBimages), gates at seed.cpp:314 / optim.cpp:153 / expand.cpp:212.
"""
import os

import numpy as np
import pytest

from cmvs_pmvs_tpu.models.engine import reconstruct
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene, write_pmvs_tree


def test_bound_restricts_patches(tmp_path):
    root = str(tmp_path)
    scene = make_plane_scene(num_cameras=5, width=128, height=96)
    write_pmvs_tree(scene, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
                "CPU 4\nsetEdge 0\nuseBound 1\nuseVisData 0\nsequence -1\n"
                "timages -1 0 5\noimages 0\n")
    with open(os.path.join(root, "bimages.dat"), "w") as f:
        f.write("1\n2\n")
    eng = reconstruct(root, "option.txt", p_cap=6000, expand_iters=1,
                      max_waves=2, refine_iters=6, log=lambda *a: None)
    assert eng.cfg.bindexes == (2,)

    alive = np.asarray(eng.cloud.alive)
    assert alive.sum() > 100
    coord = np.asarray(eng.cloud.coord)[alive]
    # every patch projects inside image 2 (the bound)
    pr = (scene.P[2] @ coord.T).T
    xy = pr[:, :2] / pr[:, 2:3]
    assert (xy[:, 0] >= -0.51).all() and (xy[:, 0] <= 127.51).all()
    assert (xy[:, 1] >= -0.51).all() and (xy[:, 1] <= 95.51).all()


def test_read_bimages_maps_ids(tmp_path):
    from cmvs_pmvs_tpu.utils.options import read_bimages
    with open(os.path.join(str(tmp_path), "bimages.dat"), "w") as f:
        f.write("3\n10 20 99\n")
    # on-disk ids [10, 20, 30] -> engine indices; 99 unknown is skipped
    assert read_bimages(str(tmp_path), [10, 20, 30]) == (0, 1)
