"""End-to-end reconstruction on the synthetic plane scene.

The aggregate-level acceptance test (SURVEY.md section 7): completeness
and accuracy of the produced cloud, not patch-for-patch identity."""
import os

import numpy as np
import pytest

from cmvs_pmvs_tpu.io.patches import read_patch_file
from cmvs_pmvs_tpu.io.ply import read_ply_xyz
from cmvs_pmvs_tpu.models.engine import reconstruct
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene, write_pmvs_tree


@pytest.fixture(scope="module")
def recon(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scene"))
    scene = make_plane_scene(num_cameras=5, width=128, height=96)
    write_pmvs_tree(scene, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
                "CPU 4\nsetEdge 0\nuseBound 0\nuseVisData 0\nsequence -1\n"
                "timages -1 0 5\noimages 0\n")
    eng = reconstruct(root, "option.txt", p_cap=6000, expand_iters=1,
                      max_waves=2, refine_iters=8, log=lambda *a: None)
    return scene, eng, root


def test_reconstruction_accuracy(recon):
    scene, eng, _ = recon
    alive = np.asarray(eng.cloud.alive)
    assert alive.sum() > 300, alive.sum()
    coord = np.asarray(eng.cloud.coord)[alive]
    dscale = np.asarray(eng.cloud.dscale)[alive]
    d = scene.plane_distance(coord[:, :3]) / dscale
    # accuracy: most patches within a pixel-scale depth step of the plane
    assert np.median(d) < 0.3, np.median(d)
    assert np.quantile(d, 0.9) < 1.0, np.quantile(d, 0.9)


def test_reconstruction_completeness(recon):
    """Coverage of the visible plane area: project patches into camera 0
    and count covered cells."""
    scene, eng, _ = recon
    alive = np.asarray(eng.cloud.alive)
    coord = np.asarray(eng.cloud.coord)[alive]
    P = scene.P[0]
    x = coord.copy()
    pr = (P @ np.concatenate([coord[:, :3], np.ones((len(coord), 1))],
                             axis=1).T).T
    pr = pr[:, :2] / pr[:, 2:3]
    csize = 2
    cells = set(map(tuple, (pr // csize).astype(int).tolist()))
    total_cells = (128 // csize) * (96 // csize)
    coverage = len(cells) / total_cells
    assert coverage > 0.25, coverage


def test_outputs_roundtrip(recon):
    scene, eng, root = recon
    ply = read_ply_xyz(os.path.join(root, "models", "option.txt.ply"))
    patches = read_patch_file(os.path.join(root, "models",
                                           "option.txt.patch"))
    n = int(np.asarray(eng.cloud.alive).sum())
    assert len(ply) == n and len(patches) == n
    # patch records reference on-disk image ids and plausible view counts
    assert all(len(p.images) >= 3 for p in patches)
    assert all(0 <= i < 5 for p in patches for i in p.images)
