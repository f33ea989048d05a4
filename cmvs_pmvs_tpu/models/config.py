"""Engine configuration: static shapes and dynamic thresholds.

Mirrors CFindMatch's fields (reference include/pmvs/findMatch.hpp:111-145,
init at source/pmvs/findMatch.cpp:30-107). Static ints shape the jitted
phases; Thresholds is a small pytree updated between expand/filter
iterations (updateThreshold, findMatch.cpp:23-28).
"""
from __future__ import annotations

import math
from dataclasses import dataclass, field, replace

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class EngineConfig:
    """Static problem shape (jit constants)."""

    level: int
    csize: int
    wsize: int
    tn: int             # number of target images
    n: int              # total images
    tau: int            # max views in optimization (findMatch.cpp:56)
    min_image_num: int
    t_store: int        # stored view slots per patch (cap, see SURVEY 7)
    p_cap: int          # patch capacity
    gh: int             # padded grid height (max over target images)
    gw: int             # padded grid width
    sequence: int = -1
    seed_cand: int = 6  # refined candidates per seed feature (cap)
    cell_k: int = 16    # per-cell fan-out cap in filters
    # useBound: engine indices of the bounding images; every patch must
    # project inside ALL of them (reference option.cpp:301-324
    # initBindexes + findMatch.cpp:109-118 insideBimages)
    bindexes: tuple = ()

    @staticmethod
    def from_options(opt, n_images: int, tn: int, gh: int, gw: int,
                     p_cap: int, bindexes: tuple = ()) -> "EngineConfig":
        tau = min(opt.min_image_num * 2, n_images)
        return EngineConfig(
            level=opt.level, csize=opt.csize, wsize=opt.wsize,
            tn=tn, n=n_images, tau=tau,
            min_image_num=opt.min_image_num,
            t_store=max(2 * tau, 12) if n_images > 2 * tau
            else n_images,
            p_cap=p_cap, gh=gh, gw=gw, sequence=opt.sequence,
            bindexes=tuple(bindexes))


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class Thresholds:
    """Dynamic thresholds (findMatch.cpp:92-106, updated :23-28)."""

    ncc: jax.Array                 # photo-consistency threshold
    ncc_before: jax.Array          # pre-optimization (ncc - 0.3)
    angle0: jax.Array              # 60 deg matching cone
    angle1: jax.Array              # 60 deg incidence cone
    max_angle: jax.Array           # min required max pair angle (option)
    quad: jax.Array                # filterQuad residual threshold
    ep: jax.Array                  # epipolar distance gate (2 px)
    count1: jax.Array              # cell attempt cap for expansion
    neighbor: jax.Array            # 0.5  (findEmptyBlocks / vimages)
    neighbor1: jax.Array           # 1.0  (filterOutside/filterExact)
    neighbor2: jax.Array           # 1.0  (filterNeighbor/groups)

    @staticmethod
    def initial(ncc_threshold: float, max_angle: float,
                quad: float) -> "Thresholds":
        deg = math.pi / 180.0
        f = jnp.float32
        return Thresholds(
            ncc=f(ncc_threshold), ncc_before=f(ncc_threshold - 0.3),
            angle0=f(60.0 * deg), angle1=f(60.0 * deg),
            max_angle=f(max_angle), quad=f(quad), ep=f(2.0),
            count1=jnp.int32(4), neighbor=f(0.5), neighbor1=f(1.0),
            neighbor2=f(1.0))

    def relaxed(self) -> "Thresholds":
        """updateThreshold: -0.05 ncc per iteration, count1 -> 2."""
        return replace(self, ncc=self.ncc - 0.05,
                       ncc_before=self.ncc_before - 0.05,
                       count1=jnp.int32(2))
