"""Checkpoint/resume round-trip of engine state."""
import os

import numpy as np
import jax.numpy as jnp

from cmvs_pmvs_tpu.models.config import EngineConfig, Thresholds
from cmvs_pmvs_tpu.models.engine import PMVSEngine, SceneData, load_scene
from cmvs_pmvs_tpu.models.patches import empty_cloud
from cmvs_pmvs_tpu.utils.options import PMVSOptions
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene, write_pmvs_tree


def test_checkpoint_roundtrip(tmp_path):
    root = str(tmp_path)
    scene = make_plane_scene(num_cameras=4, width=64, height=48)
    write_pmvs_tree(scene, root)
    with open(os.path.join(root, "option.txt"), "w") as f:
        f.write("level 0\ncsize 2\nthreshold 0.7\nwsize 7\nminImageNum 3\n"
                "useVisData 0\ntimages -1 0 4\noimages 0\n")
    opt = PMVSOptions.parse(os.path.join(root, "option.txt"))
    sdata = load_scene(root, opt)
    eng = PMVSEngine(sdata, opt, p_cap=100, log=lambda *a: None)

    # fabricate some state
    eng.cloud = eng.cloud.__class__(
        **{**eng.cloud.__dict__,
           "coord": eng.cloud.coord.at[0].set(jnp.asarray([1, 2, 3, 1.0])),
           "alive": eng.cloud.alive.at[0].set(True)})
    eng.thr = eng.thr.relaxed()
    ckpt = os.path.join(root, "state.npz")
    eng.save_checkpoint(ckpt, iteration=2)

    eng2 = PMVSEngine(sdata, opt, p_cap=100, log=lambda *a: None)
    it = eng2.load_checkpoint(ckpt)
    assert it == 2
    assert bool(eng2.cloud.alive[0])
    np.testing.assert_allclose(np.asarray(eng2.cloud.coord[0]),
                               [1, 2, 3, 1])
    assert abs(float(eng2.thr.ncc) - (0.7 - 0.05)) < 1e-6
