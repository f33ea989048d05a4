"""Score-priority wave compaction (VERDICT r2 item 5).

The reference drains a priority queue ordered by score2
(reference source/pmvs/expand.cpp:80-88, patchOrganizerS.hpp:10-15), so
under contention the best patches expand first. expand_wave must do the
same when the frontier exceeds its budget: the processed rows are the
top-score2 frontier rows, and the rest stay queued.
"""
import os

import numpy as np
import pytest
import jax.numpy as jnp

from cmvs_pmvs_tpu.models.engine import PMVSEngine, load_scene
from cmvs_pmvs_tpu.models.expand import expand_wave
from cmvs_pmvs_tpu.utils.options import PMVSOptions
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene, write_pmvs_tree


@pytest.fixture(scope="module")
def seeded(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("prio"))
    scene = make_plane_scene(num_cameras=5, width=192, height=144,
                             focal=260.0)
    write_pmvs_tree(scene, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
                "CPU 4\nsetEdge 0\nuseBound 0\nuseVisData 0\nsequence -1\n"
                "timages -1 0 5\noimages 0\n")
    opt = PMVSOptions.parse(os.path.join(root, "option.txt"))
    data = load_scene(root, opt)
    eng = PMVSEngine(data, opt, p_cap=16384, log=lambda *a: None)
    # seed + visibility only: no expansion, and no filters (they would
    # thin the sparse seed set below the contention threshold)
    eng.run(expand_iters=0, refine_iters=6)
    return data, eng


def test_small_budget_processes_top_scores(seeded):
    data, eng = seeded
    cloud, grid = eng.cloud, eng.grid
    alive = np.asarray(cloud.alive)
    n = int(alive.sum())
    fbudget = 64
    assert n > fbudget, f"scene too sparse ({n}) for the contention test"

    frontier = cloud.alive
    dflag_before = np.asarray(cloud.dflag)
    cloud2, grid2, new_frontier, st = expand_wave(
        data.cams, data.pyr, eng.cfg, eng.thr, data.visdata, cloud, grid,
        frontier, depth=1, budget=256, fbudget=fbudget, refine_iters=4)

    score = np.asarray(cloud.score2(eng.thr.ncc))
    score = np.where(alive, score, -np.inf)
    top = set(np.argsort(-score, kind="stable")[:fbudget].tolist())

    # every row whose dflag changed (i.e. was processed and failed a
    # sector) must be one of the top-fbudget scorers
    changed = np.nonzero(np.asarray(cloud2.dflag)[:len(dflag_before)]
                         != dflag_before)[0]
    assert len(changed) > 0, "wave processed nothing"
    assert all(int(i) in top for i in changed), \
        "a non-top-score row was processed under contention"

    # the skipped frontier rows stay queued for the next wave
    nf = np.asarray(new_frontier)
    skipped = [i for i in range(n) if i not in top]
    requeued = sum(bool(nf[i]) for i in skipped)
    assert requeued == len(skipped), (requeued, len(skipped))
