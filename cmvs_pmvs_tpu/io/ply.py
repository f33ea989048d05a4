"""ASCII PLY writer/reader for patch clouds.

Schema matches reference source/pmvs/patchOrganizerS.cpp:687-779:
x y z nx ny nz diffuse_{red,green,blue} quality(=ncc).
"""
from __future__ import annotations

import numpy as np

_HEADER = """ply
format ascii 1.0
element vertex {n}
property float x
property float y
property float z
property float nx
property float ny
property float nz
property uchar diffuse_red
property uchar diffuse_green
property uchar diffuse_blue
property float quality
end_header
"""


def write_patch_ply(path: str, coords: np.ndarray, normals: np.ndarray,
                    colors: np.ndarray | None = None,
                    quality: np.ndarray | None = None,
                    force_python: bool = False) -> None:
    coords = np.asarray(coords).reshape(-1, 3)
    normals = np.asarray(normals).reshape(-1, 3)
    n = len(coords)
    if colors is None:
        colors = np.full((n, 3), 128, dtype=np.int64)
    else:
        colors = np.clip(np.floor(np.asarray(colors) + 0.5), 0,
                         255).astype(np.int64).reshape(-1, 3)
    if quality is None:
        quality = np.zeros(n)
    if not force_python:
        try:   # native bulk writer (native/cmvs_pmvs_native.cpp)
            from .. import _native
            _native.write_ply(
                path, np.ascontiguousarray(coords, np.float64),
                np.ascontiguousarray(normals, np.float64),
                np.ascontiguousarray(colors, np.uint8),
                np.ascontiguousarray(quality, np.float64))
            return
        except ImportError:
            pass
    with open(path, "w") as f:
        f.write(_HEADER.format(n=n))
        for i in range(n):
            c, nn = coords[i], normals[i]
            r, g, b = colors[i]
            f.write(f"{c[0]:.9g} {c[1]:.9g} {c[2]:.9g} "
                    f"{nn[0]:.9g} {nn[1]:.9g} {nn[2]:.9g} "
                    f"{r} {g} {b} {quality[i]:.9g}\n")


def read_ply_xyz(path: str) -> np.ndarray:
    """Read vertex x,y,z from an ASCII PLY (enough for comparisons)."""
    with open(path) as f:
        line = f.readline().strip()
        if line != "ply":
            raise ValueError("Not a PLY file")
        nvert = 0
        while True:
            line = f.readline()
            if not line:
                raise ValueError("No end_header")
            if line.startswith("element vertex"):
                nvert = int(line.split()[2])
            if line.strip() == "end_header":
                break
        out = np.empty((nvert, 3))
        for i in range(nvert):
            vals = f.readline().split()
            out[i] = [float(vals[0]), float(vals[1]), float(vals[2])]
    return out
