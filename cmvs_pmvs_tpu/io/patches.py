""".patch / .pset text formats for reconstructed patch clouds.

Format (reference source/pmvs/patch.cpp:30-48 per patch,
source/pmvs/patchOrganizerS.cpp:98-131 file level):
    PATCHES
    <num>
    PATCHS
    x y z 1
    nx ny nz 0
    ncc dscale ascale
    <num images> / ids / <num vimages> / ids
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np


@dataclass
class PatchRecord:
    coord: np.ndarray           # [4] homogeneous (w = 1)
    normal: np.ndarray          # [4] (w = 0)
    ncc: float = -1.0
    dscale: float = 0.0
    ascale: float = 0.0
    images: list[int] = field(default_factory=list)
    vimages: list[int] = field(default_factory=list)


def write_patch_file(path: str, patches: list[PatchRecord]) -> None:
    with open(path, "w") as f:
        f.write("PATCHES\n")
        f.write(f"{len(patches)}\n")
        for p in patches:
            f.write("PATCHS\n")
            f.write(_vec(p.coord) + "\n")
            f.write(_vec(p.normal) + "\n")
            f.write(f"{p.ncc:.17g} {p.dscale:.17g} {p.ascale:.17g}\n")
            f.write(f"{len(p.images)}\n")
            f.write(" ".join(map(str, p.images)) + " \n")
            f.write(f"{len(p.vimages)}\n")
            f.write(" ".join(map(str, p.vimages)) + " \n")
            f.write("\n")


def read_patch_file(path: str) -> list[PatchRecord]:
    with open(path) as f:
        tokens = f.read().split()
    if tokens[0] != "PATCHES":
        raise ValueError(f"Bad patch file header: {tokens[0]}")
    num = int(tokens[1])
    out: list[PatchRecord] = []
    i = 2
    for _ in range(num):
        header = tokens[i]; i += 1
        coord = np.array([float(t) for t in tokens[i:i + 4]]); i += 4
        normal = np.array([float(t) for t in tokens[i:i + 4]]); i += 4
        ncc, dscale, ascale = (float(t) for t in tokens[i:i + 3]); i += 3
        if header == "PATCHA":  # legacy variant (patch.cpp:12-15)
            i += 5
        nimg = int(tokens[i]); i += 1
        images = [int(t) for t in tokens[i:i + nimg]]; i += nimg
        nvimg = int(tokens[i]); i += 1
        vimages = [int(t) for t in tokens[i:i + nvimg]]; i += nvimg
        out.append(PatchRecord(coord, normal, ncc, dscale, ascale,
                               images, vimages))
    return out


def write_pset(path: str, coords: np.ndarray, normals: np.ndarray,
               force_python: bool = False) -> None:
    """x y z nx ny nz per line (reference patchOrganizerS.cpp:118-131)."""
    if not force_python:
        try:   # native bulk writer (native/cmvs_pmvs_native.cpp)
            from .. import _native
            _native.write_pset(
                path,
                np.ascontiguousarray(coords, np.float64).reshape(-1, 3),
                np.ascontiguousarray(normals, np.float64).reshape(-1, 3))
            return
        except ImportError:
            pass
    with open(path, "w") as f:
        for c, n in zip(np.asarray(coords), np.asarray(normals)):
            f.write(f"{c[0]:.9g} {c[1]:.9g} {c[2]:.9g} "
                    f"{n[0]:.9g} {n[1]:.9g} {n[2]:.9g}\n")


def read_pset(path: str) -> tuple[np.ndarray, np.ndarray]:
    data = np.loadtxt(path, dtype=np.float64).reshape(-1, 6)
    return data[:, :3], data[:, 3:]


def _vec(v: np.ndarray) -> str:
    return " ".join(f"{float(x):.17g}" for x in v)
