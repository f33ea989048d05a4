"""The reference's full run protocol (VERDICT r2 item 3).

CFindMatch::run does seed, then THREE expand/filter iterations with the
expansion queue drained to fixpoint and thresholds relaxed 0.05/iteration
(reference source/pmvs/findMatch.cpp:187-220, expand.cpp:73-106). Every
other e2e test truncates this (expand_iters=1, max_waves<=2); here the
default-depth protocol runs on the occluded scene with masks and setEdge
enabled, at the reference's default level 1 (option.cpp:11) and at
level 0. The large-image (640x480) level-0 variant runs in bench.py's
bench_e2e_full on the TPU, where it is minutes, not hours.
"""
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

from cmvs_pmvs_tpu.models.engine import reconstruct
from cmvs_pmvs_tpu.utils.synthetic import make_occluded_scene, write_pmvs_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("proto"))
    scene = make_occluded_scene(num_cameras=10, width=224, height=168,
                                focal=320.0)
    write_pmvs_tree(scene, root, mask_border=6)
    return root, scene


def _opt(root, level):
    name = f"option-lv{level}.txt"
    with open(os.path.join(root, name), "w") as f:
        f.write(f"level {level}\ncsize 2\nthreshold 0.7\nwsize 7\n"
                "minImageNum 3\nCPU 4\nsetEdge 0.4\nuseBound 0\n"
                "useVisData 0\nsequence -1\ntimages -1 0 10\noimages 0\n")
    return name


def test_full_protocol_level1_beats_truncated(tree):
    """run(3, fixpoint) at the reference's default level must not lose
    completeness vs the truncated configuration."""
    root, scene = tree
    name = _opt(root, 1)
    short = reconstruct(root, name, p_cap=20000, expand_iters=1,
                        max_waves=2, refine_iters=6, log=lambda *a: None)
    n_short = int(np.asarray(short.cloud.alive).sum())
    full = reconstruct(root, name, p_cap=20000, expand_iters=3,
                       max_waves=12, refine_iters=6, log=lambda *a: None)
    n_full = int(np.asarray(full.cloud.alive).sum())
    assert n_full >= n_short, (n_full, n_short)
    assert n_full > 150, n_full


def test_full_protocol_level0_accuracy(tree):
    """Full-depth level-0 run: completeness grows across iterations and
    the relaxed thresholds do not admit off-surface patches; outputs are
    written (pmvs3 contract)."""
    root, scene = tree
    name = _opt(root, 0)
    full = reconstruct(root, name, p_cap=30000, expand_iters=3,
                       max_waves=12, refine_iters=6, log=lambda *a: None)
    n_full = int(np.asarray(full.cloud.alive).sum())
    assert n_full > 800, n_full
    assert len(full.stats) == 3      # all three iterations ran

    alive = np.asarray(full.cloud.alive)
    coord = np.asarray(full.cloud.coord)[alive][:, :3]
    dscale = np.asarray(full.cloud.dscale)[alive]
    d = scene.surface_distance(coord) / dscale
    assert np.median(d) < 0.5, np.median(d)
    assert np.quantile(d, 0.9) < 2.0, np.quantile(d, 0.9)

    stem = os.path.join(root, "models", name)
    for ext in (".patch", ".pset", ".ply"):
        assert os.path.exists(stem + ext)
