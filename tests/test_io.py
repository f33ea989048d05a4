"""Round-trip and format-conformance tests for the io layer."""
import math
import os

import numpy as np
import pytest

from cmvs_pmvs_tpu.io import (
    PatchRecord, read_bundle, read_camera_txt, read_patch_file, read_ply_xyz,
    read_pset, read_ske, read_vis, write_camera_txt, write_patch_file,
    write_pset, write_ske, write_vis, projection_from_txt,
)
from cmvs_pmvs_tpu.io.images import load_ppm, save_ppm
from cmvs_pmvs_tpu.io.ply import write_patch_ply
from cmvs_pmvs_tpu.utils.options import PMVSOptions, build_visdata


def test_camera_contour_roundtrip(tmp_path):
    P = np.array([[1000.0, 0.0, 320.0, 5.0],
                  [0.0, 1000.0, 240.0, -2.0],
                  [0.0, 0.0, 1.0, 3.0]])
    path = str(tmp_path / "00000000.txt")
    write_camera_txt(path, P)
    P2 = read_camera_txt(path)
    np.testing.assert_allclose(P2, P, rtol=0, atol=0)


def test_camera_contour2():
    # K with fx=800 fy=820 skew=1 cx=320 cy=240, identity rotation, t=(1,2,3)
    intr = np.array([800.0, 820.0, 1.0, 320.0, 240.0, 0.0])
    extr = np.array([0.0, 0.0, 0.0, 1.0, 2.0, 3.0])
    P = projection_from_txt(2, intr, extr)
    K = np.array([[800.0, 1.0, 320.0], [0, 820.0, 240.0], [0, 0, 1.0]])
    expected = K @ np.hstack([np.eye(3), [[1.0], [2.0], [3.0]]])
    np.testing.assert_allclose(P, expected, atol=1e-12)


def test_camera_contour3_projects_center():
    # fov 60deg, 640x480 image, camera at origin looking down -z
    intr = np.array([60.0, 640.0, 480.0, 0, 0, 0])
    extr = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 0.0])
    P = projection_from_txt(3, intr, extr)
    # A point straight ahead (0, 0, -5) must project to the image center.
    x = P @ np.array([0.0, 0.0, -5.0, 1.0])
    x = x / x[2]
    np.testing.assert_allclose(x[:2], [320.0, 240.0], atol=1e-9)


def test_camera_proj2q_roundtrip():
    from cmvs_pmvs_tpu.io import proj2q, q2proj
    for q in ([10.0, -20.0, 35.0, 1.0, 2.0, 3.0],
              [0.0, 0.0, 0.0, 0.0, 0.0, 0.0],
              [-170.0, 45.0, 170.0, -4.0, 0.5, 9.0]):
        m = q2proj(np.asarray(q))
        np.testing.assert_allclose(proj2q(m), q, atol=1e-10)
    # gimbal-lock branch: b = +-90deg -> mat[2,0] = -+1
    m = q2proj(np.asarray([25.0, 90.0, 0.0, 1.0, 1.0, 1.0]))
    q2 = proj2q(m)
    np.testing.assert_allclose(q2proj(q2), m, atol=1e-10)


def test_camera_contour2_file_roundtrip(tmp_path):
    from cmvs_pmvs_tpu.io import read_camera_txt_full
    intr = np.array([800.0, 820.0, 1.0, 320.0, 240.0, 0.0])
    extr = np.array([10.0, -20.0, 35.0, 1.0, 2.0, 3.0])
    path = str(tmp_path / "00000001.txt")
    write_camera_txt(path, txt_type=2, intrinsics=intr, extrinsics=extr)
    t, i2, e2 = read_camera_txt_full(path)
    assert t == 2
    np.testing.assert_allclose(i2, intr)
    np.testing.assert_allclose(e2, extr)
    P = read_camera_txt(path)
    np.testing.assert_allclose(P, projection_from_txt(2, intr, extr))


def test_vis_roundtrip(tmp_path):
    neigh = [[1, 2], [0], [0, 1], []]
    path = str(tmp_path / "vis.dat")
    write_vis(path, neigh)
    assert read_vis(path) == neigh


def test_ske_roundtrip(tmp_path):
    t = [[0, 1, 2], [3, 4]]
    o = [[3], [0, 2]]
    path = str(tmp_path / "ske.dat")
    write_ske(path, 5, t, o)
    inum, t2, o2 = read_ske(path)
    assert inum == 5 and t2 == t and o2 == o


def test_patch_roundtrip(tmp_path):
    patches = [
        PatchRecord(np.array([1.0, 2.0, 3.0, 1.0]),
                    np.array([0.0, 0.0, 1.0, 0.0]),
                    ncc=0.85, dscale=0.01, ascale=0.2,
                    images=[0, 2, 3], vimages=[1]),
        PatchRecord(np.array([-1.0, 0.5, 2.0, 1.0]),
                    np.array([0.0, 1.0, 0.0, 0.0]),
                    ncc=0.7, dscale=0.02, ascale=0.1,
                    images=[1, 0], vimages=[]),
    ]
    path = str(tmp_path / "out.patch")
    write_patch_file(path, patches)
    got = read_patch_file(path)
    assert len(got) == 2
    for a, b in zip(patches, got):
        np.testing.assert_allclose(a.coord, b.coord)
        np.testing.assert_allclose(a.normal, b.normal)
        assert a.images == b.images and a.vimages == b.vimages
        assert abs(a.ncc - b.ncc) < 1e-12


def test_pset_roundtrip(tmp_path):
    coords = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.float64)
    normals = np.array([[0, 0, 1], [0, 1, 0]], dtype=np.float64)
    path = str(tmp_path / "out.pset")
    write_pset(path, coords, normals)
    c2, n2 = read_pset(path)
    np.testing.assert_allclose(c2, coords)
    np.testing.assert_allclose(n2, normals)


def test_ply_roundtrip(tmp_path):
    coords = np.array([[1.5, -2.0, 3.0], [0.0, 1.0, 2.0]])
    normals = np.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    path = str(tmp_path / "out.ply")
    write_patch_ply(path, coords, normals,
                    colors=np.array([[255, 0, 0], [0, 255, 0]]),
                    quality=np.array([0.9, 0.8]))
    got = read_ply_xyz(path)
    np.testing.assert_allclose(got, coords, rtol=1e-6)


def test_ppm_roundtrip(tmp_path):
    img = (np.arange(5 * 7 * 3, dtype=np.uint8)).reshape(5, 7, 3)
    path = str(tmp_path / "img.ppm")
    save_ppm(path, img)
    got = load_ppm(path)
    np.testing.assert_array_equal(got, img)


def test_option_parse(tmp_path):
    text = """# a comment
level 0
csize 4
threshold 0.65
wsize 9
minImageNum 2
CPU 8
setEdge 0
useBound 0
useVisData 0
sequence -1
maxAngle 12
quad 2.0
timages -1 0 5
oimages 2 7 9
"""
    path = str(tmp_path / "option.txt")
    with open(path, "w") as f:
        f.write(text)
    opt = PMVSOptions.parse(path)
    assert opt.level == 0 and opt.csize == 4 and opt.wsize == 9
    assert opt.threshold == 0.65 and opt.min_image_num == 2
    assert opt.timages == [0, 1, 2, 3, 4]
    assert opt.oimages == [7, 9]
    assert abs(opt.max_angle_threshold - math.radians(12)) < 1e-9
    # writer round-trips through the parser
    path2 = str(tmp_path / "option2.txt")
    opt.write(path2, comment="roundtrip")
    opt2 = PMVSOptions.parse(path2)
    assert opt2.timages == opt.timages and opt2.oimages == opt.oimages
    assert abs(opt2.threshold - opt.threshold) < 1e-9


def test_option_unknown_key(tmp_path):
    path = str(tmp_path / "option.txt")
    with open(path, "w") as f:
        f.write("bogus 1\ntimages -1 0 2\noimages 0\n")
    with pytest.raises(ValueError, match="Unrecognizable"):
        PMVSOptions.parse(path)


def test_visdata_all_to_all(tmp_path):
    path = str(tmp_path / "option.txt")
    with open(path, "w") as f:
        f.write("useVisData 0\ntimages -1 0 3\noimages 0\n")
    opt = PMVSOptions.parse(path)
    vis = build_visdata(opt, str(tmp_path))
    assert vis == [[1, 2], [0, 2], [0, 1]]


def test_visdata_from_file_symmetrized(tmp_path):
    # vis.dat over image ids 0..3; engine uses images [0, 2, 3]
    write_vis(str(tmp_path / "vis.dat"), [[2], [0], [], [0]])
    path = str(tmp_path / "option.txt")
    with open(path, "w") as f:
        f.write("useVisData 1\ntimages 2 0 2\noimages 1 3\n")
    opt = PMVSOptions.parse(path)
    vis = build_visdata(opt, str(tmp_path))
    # engine idx: 0->image0, 1->image2, 2->image3
    # raw: 0 sees 2 (sym), 3 sees 0 (sym)
    assert vis == [[1, 2], [0], [0]]


def test_oimages_from_visdata(tmp_path):
    write_vis(str(tmp_path / "vis.dat"), [[1, 2], [0], [0, 3], [2]])
    path = str(tmp_path / "option.txt")
    with open(path, "w") as f:
        f.write("useVisData 1\ntimages 2 0 2\noimages -2\n")
    opt = PMVSOptions.parse(path)
    opt = opt.resolve_oimages(str(tmp_path))
    # timages {0,2}; neighbors outside: 0->{1}, 2->{3}
    assert opt.oimages == [1, 3]


def test_bundler_reader(tmp_path):
    text = """# Bundle file v0.3
3 2
800 0 0  1 0 0 0 1 0 0 0 1  0 0 0
0 0 0    1 0 0 0 1 0 0 0 1  0 0 0
900 0.1 0.2  0 1 0 1 0 0 0 0 1  1 2 3
1.0 2.0 3.0
255 128 0
2 0 11 0.5 0.5 2 12 0.1 0.1
5.0 6.0 7.0
0 255 0
2 5 13 0.2 0.2 0 14 0.3 0.3
"""
    path = str(tmp_path / "bundle.rd.out")
    with open(path, "w") as f:
        f.write(text)
    b = read_bundle(path)
    # camera 1 dropped (f=0); point 2's out-of-range camera 5 is skipped
    # leaving a single view -> point dropped (reference bundle.cpp:597-624)
    assert b.num_cameras == 2
    assert b.num_points == 1
    np.testing.assert_allclose(b.focals, [800, 900])
    np.testing.assert_allclose(b.coords[0], [1.0, 2.0, 3.0])
    assert b.visibles[0] == [0, 1]
    assert list(b.original_ids) == [0, 2]
