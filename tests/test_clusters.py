"""Cluster scheduler: discovery, host assignment, merge, resume-skip."""
import os

import numpy as np

from cmvs_pmvs_tpu.io.patches import PatchRecord, read_patch_file, \
    write_patch_file
from cmvs_pmvs_tpu.io.ply import read_ply_xyz, write_patch_ply
from cmvs_pmvs_tpu.parallel.clusters import (
    assign_clusters, discover_options, merge_models, run_clusters,
)


def _make_tree(root, n_clusters):
    os.makedirs(os.path.join(root, "models"), exist_ok=True)
    names = ["option-%04d" % c for c in range(n_clusters)]
    with open(os.path.join(root, "pmvs.sh"), "w") as f:
        f.write("".join(f"pmvs3 pmvs/ {n}\n" for n in names))
    for c, name in enumerate(names):
        open(os.path.join(root, name), "w").write("level 1\n")
        coords = np.array([[c, 0.0, 1.0], [c, 1.0, 2.0]])
        normals = np.tile([0.0, 0.0, -1.0], (2, 1))
        recs = [PatchRecord(np.append(coords[i], 1.0),
                            np.append(normals[i], 0.0), ncc=0.8,
                            images=[c, c + 1]) for i in range(2)]
        stem = os.path.join(root, "models", name)
        write_patch_file(stem + ".patch", recs)
        write_patch_ply(stem + ".ply", coords, normals,
                        quality=np.full(2, 0.8))
    return names


def test_discover_and_assign(tmp_path):
    root = str(tmp_path)
    names = _make_tree(root, 5)
    assert discover_options(root) == names
    # no pmvs.sh -> glob fallback, same order
    os.remove(os.path.join(root, "pmvs.sh"))
    assert discover_options(root) == names
    # round-robin covers every cluster exactly once across processes
    parts = [assign_clusters(names, i, 2) for i in range(2)]
    assert parts[0] == ["option-0000", "option-0002", "option-0004"]
    assert parts[1] == ["option-0001", "option-0003"]
    assert sorted(sum(parts, [])) == names


def test_merge_models(tmp_path):
    root = str(tmp_path)
    _make_tree(root, 3)
    out = merge_models(root)
    recs = read_patch_file(out + ".patch")
    assert len(recs) == 6
    xyz = read_ply_xyz(out + ".ply")
    assert xyz.shape == (6, 3)
    # colors/vertex lines preserved from the per-cluster PLYs
    np.testing.assert_allclose(sorted(xyz[:, 0]), [0, 0, 1, 1, 2, 2])
    pset = np.loadtxt(out + ".pset").reshape(-1, 6)
    assert pset.shape == (6, 6)


def test_run_clusters_resume_skip(tmp_path, monkeypatch):
    root = str(tmp_path)
    names = _make_tree(root, 3)
    ran = []

    class FakeCloud:
        def count(self):
            return 7

    class FakeEngine:
        cloud = FakeCloud()
        stats = []

    def fake_reconstruct(prefix, name, p_cap=0, log=print, **kw):
        ran.append(name)
        return FakeEngine()

    import cmvs_pmvs_tpu.models.engine as eng
    monkeypatch.setattr(eng, "reconstruct", fake_reconstruct)

    # mark cluster 1 complete; process 0/1 owns everything
    open(os.path.join(root, "models", names[1] + ".done"), "w").write("1 0\n")
    runs = run_clusters(root, process_index=0, process_count=1,
                        checkpoint=True, log=lambda *a: None)
    assert ran == [names[0], names[2]]
    assert [r.skipped for r in runs] == [False, True, False]
    assert runs[0].patches == 7
    # all done markers now exist -> second invocation runs nothing
    ran.clear()
    run_clusters(root, process_index=0, process_count=1, checkpoint=True,
                 log=lambda *a: None)
    assert ran == []
