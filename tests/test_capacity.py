"""Auto-grow capacity + truncation observability (VERDICT r2 items 6, 9).

A run whose patch cloud overflows a tiny initial p_cap must auto-grow and
finish with the same cloud as a run given ample capacity from the start;
cell_k / t_store truncation must be surfaced in PMVSEngine.stats.
"""
import os

import numpy as np
import pytest

from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
from cmvs_pmvs_tpu.utils.options import PMVSOptions
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene, write_pmvs_tree


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("grow"))
    scene = make_plane_scene(num_cameras=5, width=192, height=144,
                             focal=260.0)
    write_pmvs_tree(scene, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
                "CPU 4\nsetEdge 0\nuseBound 0\nuseVisData 0\nsequence -1\n"
                "timages -1 0 5\noimages 0\n")
    opt = PMVSOptions.parse(os.path.join(root, "option.txt"))
    data = load_scene(root, opt)
    return data, opt


def _run(data, opt, p_cap):
    eng = PMVSEngine(data, opt, p_cap=p_cap, log=lambda *a: None)
    eng.run(expand_iters=1, max_waves=2, refine_iters=6)
    return eng


def test_autogrow_matches_large_capacity(tree):
    data, opt = tree
    small = _run(data, opt, p_cap=1024)     # forces overflow + growth
    large = _run(data, opt, p_cap=16384)
    assert small.p_cap > 1024, "overflow never triggered auto-grow"
    n_small = int(np.asarray(small.cloud.alive).sum())
    n_large = int(np.asarray(large.cloud.alive).sum())
    assert n_small == n_large, (n_small, n_large)
    # same patch set, not just the same count
    cs = np.asarray(small.cloud.coord)[np.asarray(small.cloud.alive)]
    cl = np.asarray(large.cloud.coord)[np.asarray(large.cloud.alive)]
    assert np.allclose(np.sort(cs, axis=0), np.sort(cl, axis=0),
                       atol=1e-5)


def test_truncation_counters_surface(tree):
    data, opt = tree
    eng = _run(data, opt, p_cap=16384)
    assert eng.stats, "no iteration stats recorded"
    for st in eng.stats:
        assert "cell_trunc" in st and "view_drops" in st
        assert st["cell_trunc"] >= 0 and st["view_drops"] >= 0
