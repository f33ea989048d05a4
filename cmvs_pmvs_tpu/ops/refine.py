"""Batched patch refinement: Levenberg-Marquardt over (depth, alpha, beta).

The TPU replacement for the reference's per-patch nlopt BOBYQA loop
(reference source/pmvs/optim.cpp:496-658): the same 3-DOF parametrization -
depth offset along the reference-view ray in units of `dscale`, two Euler
angles of the normal in the reference-camera frame in units of pi/48 with
bounds +-23.99999 (optim.cpp:580-707) - and the same robust-INCC objective
`my_f` (optim.cpp:507-578), but minimized for B patches at once by damped
Gauss-Newton with central-difference Jacobians of the per-view sqrt-INCC
residuals. All control flow is mask-based; the whole refine step is one
jittable function.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp

from ..geom.cameras import CameraSet, get_unit, project
from ..image.pyramid import PyramidSet
from .texture import grab_tex, ncc_dot, normalize_tex, robustincc, unrobustincc

ASCALE = jnp.pi / 48.0          # optim.cpp:590
ANGLE_BOUND = 23.99999          # optim.cpp:601-602
HUGE = 1.0e10


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class RefineProblem:
    """Per-patch constants of one refinement batch.

    views[:, 0] is the reference view (optim.cpp:584-590).
    """

    centers: jax.Array     # [B, 4] patch center at entry
    rays: jax.Array        # [B, 4] unit ray ref-center -> patch (w = 0)
    dscales: jax.Array     # [B]
    views: jax.Array       # [B, T] int32, -1 padded
    view_valid: jax.Array  # [B, T] bool
    weights: jax.Array     # [B, T] INCC weights (optim.cpp:592-596)
    min_image_num: int = field(metadata=dict(static=True))


def encode_params(cams: CameraSet, prob: RefineProblem, coord, normal):
    """(coord, normal) -> [B, 3] scaled params (optim.cpp:660-688)."""
    ref = jnp.maximum(prob.views[:, 0], 0)
    p0 = (jnp.einsum("bk,bk->b", coord - prob.centers, prob.rays)
          / prob.dscales)
    fx = jnp.einsum("bk,bk->b", cams.xaxis[ref], normal[:, :3])
    fy = jnp.einsum("bk,bk->b", cams.yaxis[ref], normal[:, :3])
    fz = jnp.einsum("bk,bk->b", cams.zaxis[ref], normal[:, :3])
    p2 = jnp.arcsin(jnp.clip(fy, -1.0, 1.0))
    cosb = jnp.cos(p2)
    safe_cosb = jnp.where(cosb == 0.0, 1.0, cosb)
    sina = fx / safe_cosb
    cosa = -fz / safe_cosb
    p1 = jnp.arccos(jnp.clip(cosa, -1.0, 1.0))
    p1 = jnp.where(sina < 0.0, -p1, p1)
    p1 = jnp.where(cosb == 0.0, 0.0, p1)
    return jnp.stack([p0, p1 / ASCALE, p2 / ASCALE], axis=-1)


def decode_params(cams: CameraSet, prob: RefineProblem, p):
    """[B, 3] params -> (coord [B, 4], normal [B, 4])
    (optim.cpp:690-707)."""
    ref = jnp.maximum(prob.views[:, 0], 0)
    coord = prob.centers + (prob.dscales * p[:, 0])[:, None] * prob.rays
    a1 = p[:, 1] * ASCALE
    a2 = p[:, 2] * ASCALE
    fx = jnp.sin(a1) * jnp.cos(a2)
    fy = jnp.sin(a2)
    fz = -jnp.cos(a1) * jnp.cos(a2)
    n3 = (cams.xaxis[ref] * fx[:, None] + cams.yaxis[ref] * fy[:, None]
          + cams.zaxis[ref] * fz[:, None])
    normal = jnp.concatenate(
        [n3, jnp.zeros(n3.shape[:-1] + (1,), n3.dtype)], axis=-1)
    return coord, normal


def compute_units(cams: CameraSet, level: int, coord, normal, views,
                  view_valid):
    """Per-view fineness units: getUnit / max(ray.normal, 0)
    (reference optim.cpp:446-471); invalid or back-facing -> HUGE."""
    vid = jnp.maximum(views, 0)
    unit = get_unit(cams, vid, coord[:, None, :], level)
    ray = cams.center[vid] - coord[:, None, :]
    ray = ray / jnp.linalg.norm(ray[..., :3], axis=-1, keepdims=True)
    denom = jnp.einsum("btk,bk->bt", ray[..., :3], normal[:, :3])
    fine = jnp.where(denom > 0.0, unit / jnp.where(denom > 0.0, denom, 1.0),
                     HUGE)
    return jnp.where(view_valid, fine, HUGE)


def set_scales(cams: CameraSet, level: int, wsize: int, coord, views,
               view_valid):
    """Per-patch (dscale, ascale) (reference patchOrganizerS.cpp:663-684):
    dscale = depth step along the reference ray that moves the projection
    in the other views by ~1 pixel on average; ascale = atan(dscale /
    (unit * wsize/2)).

    coord: [B, 4]; views: [B, T] (ref at [:, 0]). Averages over the valid
    non-reference views (the reference caps at tau by construction).
    """
    ref = jnp.maximum(views[:, 0], 0)
    unit = get_unit(cams, ref, coord, level)
    unit2 = 2.0 * unit
    ray = coord - cams.center[ref]
    ray = ray / jnp.linalg.norm(ray[..., :3], axis=-1, keepdims=True)

    vid = jnp.maximum(views, 0)
    P = cams.P[vid]
    pa = project(P, coord[:, None, :], level)
    pb = project(P, (coord - ray * unit2[:, None])[:, None, :], level)
    diff = jnp.linalg.norm((pa - pb)[..., :2], axis=-1)
    m = view_valid.at[:, 0].set(False)
    denom = jnp.maximum(m.sum(axis=-1), 1)
    dmove = jnp.where(m, diff, 0.0).sum(axis=-1) / denom
    dscale = unit2 / jnp.where(dmove == 0.0, 1.0, dmove)
    ascale = jnp.arctan(dscale / (unit * wsize / 2.0))
    return dscale, ascale


def make_problem(cams: CameraSet, level: int, coord, normal, views,
                 view_valid, dscales, min_image_num: int) -> RefineProblem:
    """Set up the batch constants (reference refinePatchBFGS entry,
    optim.cpp:582-596: centers/rays/weights fixed at the initial patch)."""
    ref = jnp.maximum(views[:, 0], 0)
    ray = coord - cams.center[ref]
    ray = ray / jnp.linalg.norm(ray[..., :3], axis=-1, keepdims=True)
    units = compute_units(cams, level, coord, normal, views, view_valid)
    w = jnp.minimum(1.0, units[:, 0:1] / jnp.maximum(units, 1e-30))
    w = w.at[:, 0].set(1.0)
    w = jnp.where(view_valid, w, 0.0)
    return RefineProblem(centers=coord, rays=ray, dscales=dscales,
                         views=views, view_valid=view_valid, weights=w,
                         min_image_num=min_image_num)


def _patch_axes(cams: CameraSet, level: int, ref, coord, normal):
    """getPAxes against the reference view (optim.cpp:1127-1144)."""
    pscale = get_unit(cams, ref, coord, level)
    n3 = normal[..., :3]
    y3 = jnp.cross(n3, cams.xaxis[ref])
    y3 = y3 / jnp.linalg.norm(y3, axis=-1, keepdims=True)
    x3 = jnp.cross(y3, n3)
    zeros = jnp.zeros(x3.shape[:-1] + (1,), coord.dtype)
    px = jnp.concatenate([x3, zeros], axis=-1) * pscale[..., None]
    py = jnp.concatenate([y3, zeros], axis=-1) * pscale[..., None]
    P = cams.P[ref]
    pc = project(P, coord, level)
    xdis = jnp.linalg.norm(
        (project(P, coord + px, level) - pc)[..., :2], axis=-1)
    ydis = jnp.linalg.norm(
        (project(P, coord + py, level) - pc)[..., :2], axis=-1)
    px = px / jnp.where(xdis == 0.0, 1.0, xdis)[..., None]
    py = py / jnp.where(ydis == 0.0, 1.0, ydis)[..., None]
    return px, py


def _grab_all(cams, pyr, level, wsize, prob: RefineProblem, coord, normal):
    ref = jnp.maximum(prob.views[:, 0], 0)
    px, py = _patch_axes(cams, level, ref, coord, normal)
    texs, ok = grab_tex(cams, pyr, level, wsize, coord, px, py, normal,
                        prob.views, prob.view_valid)
    texs = normalize_tex(texs, ok)
    return texs, ok


# Pallas INCC kernel control: None = auto (on for TPU backends, off for
# CPU where Mosaic is unavailable/slow); tests flip this explicitly.
USE_PALLAS_INCC: bool | None = None

# Fan-kernel formulation: True = the sample-major v2 kernel
# (ops/pallas_fan2 - lanes carry one pair's samples, ~4x less
# hat-weight compute), False = the v1 candidate-column kernel
# (ops/pallas_fan). v1 remains as fallback/ablation.
USE_FAN_V2: bool = True


def _incc_probes(cams, pyr, level, wsize, views, view_valid, cf, nf,
                 precise):
    """Raw robust INCCs + validity for [fan, B, 4] probe stacks through
    whichever fused fan kernel is active. Returns (incc [B, T, fan],
    ok [B, T, fan])."""
    fan = cf.shape[0]
    t = views.shape[1]
    s2 = wsize * wsize
    if USE_FAN_V2 and pyr.tiles2 is not None:
        from .pallas_fan2 import fan_geometry2, incc_fan2
        tilemap, frames, ok = fan_geometry2(cams, pyr, level, wsize,
                                            views, view_valid, cf, nf)
        # candidate-only (fan=1) evaluations are per-step-overhead
        # bound (expansion/fold/moment matmul launches, out write);
        # 4x the patches per grid step amortizes that to the fan=4
        # level (same LTOT lane width; measured 6.7 -> ~4.4 ms/call)
        ppv = 16 if fan == 1 else 4
        incc = incc_fan2(pyr.tiles2, tilemap, frames, ppv=ppv, t=t,
                         fan=fan, s2=s2, wsize=wsize, precise=precise)
        return incc, ok
    from .pallas_fan import fan_geometry, incc_fan
    tilemap, geom, ok = fan_geometry(cams, pyr, level, wsize, views,
                                     view_valid, cf, nf)
    incc = incc_fan(pyr.tiles, tilemap, geom, ppv=4, t=t, fan=fan,
                    s2=s2, wsize=wsize, precise=precise)
    return incc, ok


def _pallas_enabled() -> bool:
    from .texture import SAMPLING
    if SAMPLING != "bilinear":
        return False   # fused kernels are bilinear-only (ref default)
    if USE_PALLAS_INCC is not None:
        return USE_PALLAS_INCC
    return jax.default_backend() != "cpu"


def per_view_inccs(cams, pyr, level, wsize, prob: RefineProblem, coord,
                   normal):
    """Robust INCC of each non-reference view vs the reference window.

    Returns (incc [B, T] with 2.0 at invalid pairs, ref_ok [B],
    pair_ok [B, T]). Mirrors my_f's reference-based branch
    (optim.cpp:556-575). On TPU the grab+normalize+NCC runs in the fused
    fan kernel (ops/pallas_fan, fan=1)."""
    if _pallas_enabled() and (pyr.tiles is not None
                              or pyr.tiles2 is not None):
        incc4, ok4 = _incc_probes(cams, pyr, level, wsize, prob.views,
                                  prob.view_valid, coord[None],
                                  normal[None], precise=True)
        incc = incc4[:, :, 0]
        ok = ok4[:, :, 0]
        ref_ok = ok[:, 0]
        pair_ok = ok & ref_ok[:, None]
        pair_ok = pair_ok.at[:, 0].set(False)
        incc = jnp.where(pair_ok, incc, 2.0)
        return incc, ref_ok, pair_ok

    texs, ok = _grab_all(cams, pyr, level, wsize, prob, coord, normal)
    ref_ok = ok[:, 0]
    dots = ncc_dot(texs[:, 0:1], texs)                   # [B, T]
    incc = robustincc(1.0 - dots)
    pair_ok = ok & ok[:, 0:1]
    pair_ok = pair_ok.at[:, 0].set(False)                # skip i == 0
    incc = jnp.where(pair_ok, incc, 2.0)
    return incc, ref_ok, pair_ok


def incc_objective(cams, pyr, level, wsize, prob: RefineProblem, p,
                   view_axis: str | None = None):
    """The scalar objective my_f (optim.cpp:507-578), batched.

    When `view_axis` is set (inside shard_map), each shard holds the
    reference view in slot 0 plus its slice of the other views; the sum
    and count of per-view INCCs are psum'd over the axis so every shard
    sees the global objective (tensor-parallel views over ICI).

    Returns (f [B], incc [B, T_local], pair_ok [B, T_local])."""
    coord, normal = decode_params(cams, prob, p)
    incc, ref_ok, pair_ok = per_view_inccs(cams, pyr, level, wsize, prob,
                                           coord, normal)
    denom = pair_ok.sum(axis=-1)
    nviews = prob.view_valid.sum(axis=-1)
    total = jnp.where(pair_ok, incc, 0.0).sum(axis=-1)
    if view_axis is not None:
        denom = jax.lax.psum(denom, view_axis)
        total = jax.lax.psum(total, view_axis)
        nviews = jax.lax.psum(nviews - 1, view_axis) + 1  # ref counted once
    mininum = jnp.minimum(prob.min_image_num, nviews)
    mean = total / jnp.maximum(denom, 1)
    bad = (~ref_ok) | (denom < mininum - 1)
    f = jnp.where(bad, 2.0, mean)
    return f, incc, pair_ok


FAN_H = 0.4   # forward-difference probe step (param units)


def _solve3x3(A, b):
    """Batched closed-form 3x3 solve via the adjugate.

    jnp.linalg.solve lowers to a LAPACK-style custom call that costs
    ~6 ms per LM iteration at B=8k on TPU (xprof: custom-call.82); the
    cofactor form is pure fusible elementwise math. A [B, 3, 3] must be
    well-conditioned (callers add Levenberg damping).
    """
    a, b_, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    d, e, f = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
    g, h, i = A[:, 2, 0], A[:, 2, 1], A[:, 2, 2]
    co00 = e * i - f * h
    co01 = c * h - b_ * i
    co02 = b_ * f - c * e
    co10 = f * g - d * i
    co11 = a * i - c * g
    co12 = c * d - a * f
    co20 = d * h - e * g
    co21 = b_ * g - a * h
    co22 = a * e - b_ * d
    det = a * co00 + b_ * co10 + c * co20
    inv_det = jnp.where(jnp.abs(det) < 1e-30, 0.0, 1.0 / det)
    x0 = (co00 * b[:, 0] + co01 * b[:, 1] + co02 * b[:, 2]) * inv_det
    x1 = (co10 * b[:, 0] + co11 * b[:, 1] + co12 * b[:, 2]) * inv_det
    x2 = (co20 * b[:, 0] + co21 * b[:, 1] + co22 * b[:, 2]) * inv_det
    return jnp.stack([x0, x1, x2], axis=-1)


# Jacobian refresh period of the fan LM loop: every REFRESH-th
# iteration evaluates the full 4-probe fan (candidate + 3
# forward-difference probes); the iterations between evaluate ONLY the
# candidate (fan=1, ~1/4 the kernel cost) and maintain J by a Broyden
# rank-1 secant update on accepted steps. Cuts objective evaluations
# per 8-iteration refinement from 36 to 24 (initial 4-probe fan + 4
# full fans + 4 candidate-only evals vs 9 full fans; the reference's
# BOBYQA also keeps a quadratic model across iterations rather than
# re-sampling, optim.cpp:621-638). Accuracy cost measured on the bench
# scene: median plane offset 0.135 -> 0.187 dscale at 8 iterations
# (far inside the 0.5-unit visibility/filter tolerances); callers that
# need the old all-full-eval behavior pass broyden_refresh=1 to
# refine_patches.
BROYDEN_REFRESH = 2


def _refine_patches_fan(cams, pyr, level, wsize, prob: RefineProblem,
                        coord, normal, num_iters, active,
                        with_ncc: bool = True,
                        broyden_refresh: int | None = None):
    """TPU fast path: Levenberg-Marquardt with fused fan evaluations.

    Full-refresh iterations run ONE Pallas call (ops/pallas_fan.incc_fan)
    evaluating the candidate step plus 3 forward-difference probes for
    every (patch, view) pair, streaming fresh image tiles from HBM each
    time - no cached-block drift. Between refreshes (BROYDEN_REFRESH)
    the candidate alone is evaluated and the residual Jacobian follows
    a Broyden secant update; on a rejected step the Jacobian from the
    last accepted point is reused with a larger damping (classic LM).
    """
    b0, t = prob.views.shape
    s2 = wsize * wsize

    p0 = encode_params(cams, prob, coord, normal)
    p0 = p0.at[:, 1:].set(jnp.clip(p0[:, 1:], -ANGLE_BOUND, ANGLE_BOUND))
    h = FAN_H
    nviews = prob.view_valid.sum(axis=-1)
    mininum = jnp.minimum(prob.min_image_num, nviews)

    def _masked_objective(incc, ok):
        """(f [B, F], r [B, T, F]) from raw fan INCCs and validity,
        both [B, T, F]."""
        ref_ok = ok[:, 0, :]                                 # [B, F]
        pair_ok = (ok & ref_ok[:, None, :]).at[:, 0, :].set(False)
        incc = jnp.where(pair_ok, incc, 2.0)
        denom = pair_ok.sum(axis=1)                          # [B, F]
        mean = jnp.where(pair_ok, incc, 0.0).sum(axis=1) \
            / jnp.maximum(denom, 1)
        f_fan = jnp.where((~ref_ok) | (denom < mininum[:, None] - 1),
                          2.0, mean)
        r_fan = jnp.sqrt(jnp.where(pair_ok, jnp.maximum(incc, 0.0), 0.0)
                         + 1e-8)
        r_fan = jnp.where(pair_ok, r_fan, 0.0)               # [B, T, F]
        return f_fan, r_fan

    def fan_eval(p):
        """f [B], r [B, T], J [B, T, 3] at parameter p (4-probe fan)."""
        ps = jnp.stack([p,
                        p.at[:, 0].add(h),
                        p.at[:, 1].add(h),
                        p.at[:, 2].add(h)])                  # [4, B, 3]
        cf, nf = jax.vmap(lambda q: decode_params(cams, prob, q))(ps)
        incc, ok = _incc_probes(cams, pyr, level, wsize, prob.views,
                                prob.view_valid, cf, nf,
                                precise=False)               # [B, T, 4]
        f_fan, r_fan = _masked_objective(incc, ok)
        J = (r_fan[..., 1:] - r_fan[..., 0:1]) / h
        return f_fan[:, 0], r_fan[..., 0], J

    def cand_eval(p):
        """f [B], r [B, T] at parameter p only (fan=1 light call)."""
        cf, nf = decode_params(cams, prob, p)
        incc, ok = _incc_probes(cams, pyr, level, wsize, prob.views,
                                prob.view_valid, cf[None], nf[None],
                                precise=False)               # [B, T, 1]
        f_fan, r_fan = _masked_objective(incc, ok)
        return f_fan[:, 0], r_fan[..., 0]

    f0, r0, J0 = fan_eval(p0)
    lam0 = jnp.zeros_like(f0) + 1e-3
    eye = jnp.eye(3, dtype=p0.dtype)[None]

    def step(state, full: bool):
        p, f, r, J, lam = state
        JtJ = jnp.einsum("btk,btl->bkl", J, J)
        Jtr = jnp.einsum("btk,bt->bk", J, r)
        damped = JtJ + lam[:, None, None] * eye + 1e-9 * eye
        delta = _solve3x3(damped, -Jtr)
        delta = jnp.clip(delta, -4.0, 4.0)
        p_cand = p + delta
        p_cand = p_cand.at[:, 1:].set(
            jnp.clip(p_cand[:, 1:], -ANGLE_BOUND, ANGLE_BOUND))
        delta = p_cand - p
        if full:
            f_new, r_new, J_new = fan_eval(p_cand)
        else:
            f_new, r_new = cand_eval(p_cand)
            # Broyden secant: J' = J + ((dr - J delta) delta^T) / |delta|^2
            Jd = jnp.einsum("btk,bk->bt", J, delta)
            dd = jnp.maximum(jnp.einsum("bk,bk->b", delta, delta), 1e-12)
            J_new = J + ((r_new - r - Jd) / dd[:, None])[..., None] \
                * delta[:, None, :]
        accept = (f_new < f) & active
        p = jnp.where(accept[:, None], p_cand, p)
        r = jnp.where(accept[:, None], r_new, r)
        J = jnp.where(accept[:, None, None], J_new, J)
        f = jnp.where(accept, f_new, f)
        lam = jnp.clip(jnp.where(accept, lam * 0.3, lam * 4.0),
                       1e-5, 1e4)
        return (p, f, r, J, lam), None

    # static refresh schedule: iteration 0's J comes from the initial
    # full eval; refreshes land every `refresh` iterations (refresh=1
    # restores the pre-Broyden all-full-eval schedule)
    refresh = BROYDEN_REFRESH if broyden_refresh is None \
        else broyden_refresh
    state = (p0, f0, r0, J0, lam0)
    full_iters = [i for i in range(num_iters)
                  if i % refresh == refresh - 1]
    # scan over the light iterations in segments between full refreshes
    it = 0
    for nxt in full_iters + [num_iters]:
        nlight = nxt - it
        if nlight > 0:
            state, _ = jax.lax.scan(lambda s, _: step(s, False), state,
                                    None, length=nlight)
        if nxt < num_iters:
            state, _ = step(state, True)
        it = nxt + 1
    (p, f, r, _, _) = state

    new_coord, new_normal = decode_params(cams, prob, p)
    new_coord = jnp.where(active[:, None], new_coord, coord)
    new_normal = jnp.where(active[:, None], new_normal, normal)
    # the weighted NCC score (patch._ncc, optim.cpp:652) reconstructs
    # from the LM state's final residuals - r = sqrt(incc + 1e-8) at
    # the last ACCEPTED parameters, exactly the final geometry - so no
    # extra kernel evaluation is needed. (Score noise vs a dedicated
    # precise-mode call is the fast path's ~2e-3 window rounding,
    # inside every threshold's margin; v1 paid a full precise fan call
    # here, ~7 ms/wave at the bench shape.)
    if with_ncc:
        pair_ok = r > 0.0
        incc_v = jnp.where(pair_ok, jnp.maximum(r * r - 1e-8, 0.0), 0.0)
        w = jnp.where(pair_ok, prob.weights, 0.0)
        total = w.sum(axis=-1)
        score = (incc_v * w).sum(axis=-1) \
            / jnp.where(total == 0.0, 1.0, total)
        score = jnp.where(total == 0.0, 2.0, score)
        ncc = 1.0 - unrobustincc(score)
    else:
        ncc = None
    return new_coord, new_normal, ncc, f


def refine_patches(cams: CameraSet, pyr: PyramidSet, level: int, wsize: int,
                   prob: RefineProblem, coord, normal, num_iters: int = 12,
                   active=None, view_axis: str | None = None,
                   with_ncc: bool = True,
                   broyden_refresh: int | None = None):
    """Damped Gauss-Newton minimization of the robust INCC objective.

    Replaces refinePatchBFGS (optim.cpp:580-658). Returns
    (coord, normal, ncc, final_f): refined geometry, the weighted NCC score
    the reference stores as patch._ncc = 1 - unrobustincc(INCC_weighted)
    (optim.cpp:652), and the final objective value.

    `active`: [B] bool; inactive rows pass through unchanged (they still
    cost compute - callers should compact batches when worthwhile).
    `view_axis`: shard_map axis name for tensor-parallel views; the
    Gauss-Newton normal equations are psum'd over it so all shards take
    identical steps.
    """
    if active is None:
        active = jnp.ones(coord.shape[0], bool)

    if _pallas_enabled() and view_axis is None \
            and (pyr.tiles is not None or pyr.tiles2 is not None):
        return _refine_patches_fan(cams, pyr, level, wsize, prob,
                                   coord, normal, num_iters, active,
                                   with_ncc=with_ncc,
                                   broyden_refresh=broyden_refresh)

    p0 = encode_params(cams, prob, coord, normal)
    p0 = p0.at[:, 1:].set(jnp.clip(p0[:, 1:], -ANGLE_BOUND, ANGLE_BOUND))

    def objective(p):
        return incc_objective(cams, pyr, level, wsize, prob, p,
                              view_axis=view_axis)

    def residuals(p):
        f, incc, pair_ok = objective(p)
        # sqrt residuals so sum r^2 == sum incc (GN target == my_f target)
        r = jnp.sqrt(jnp.where(pair_ok, jnp.maximum(incc, 0.0), 0.0) + 1e-8)
        r = jnp.where(pair_ok, r, 0.0)
        return f, r, pair_ok

    f0, r0, _ = residuals(p0)
    h = jnp.asarray([0.4, 0.4, 0.4], p0.dtype)

    # all 6 central-difference probes evaluate as ONE 6x-batched objective
    # call: one kernel instance instead of six (compile time and batch
    # occupancy both improve)
    b = coord.shape[0]
    prob6 = jax.tree_util.tree_map(
        lambda x: jnp.concatenate([x] * 6, axis=0)
        if isinstance(x, jax.Array) and x.ndim >= 1 and x.shape[0] == b
        else x, prob)

    def residuals6(p6):
        f, incc, pair_ok = incc_objective(cams, pyr, level, wsize, prob6,
                                          p6, view_axis=view_axis)
        r = jnp.sqrt(jnp.where(pair_ok, jnp.maximum(incc, 0.0), 0.0)
                     + 1e-8)
        return jnp.where(pair_ok, r, 0.0)

    def step(state, _):
        p, f, r, lam = state
        # central-difference Jacobian of residuals wrt the 3 params
        probes = []
        for k in range(3):
            dp = jnp.zeros_like(p).at[:, k].set(h[k])
            probes.extend([p + dp, p - dp])
        r6 = residuals6(jnp.concatenate(probes, axis=0))
        rs = [r6[i * b:(i + 1) * b] for i in range(6)]
        cols = [(rs[2 * k] - rs[2 * k + 1]) / (2.0 * h[k])
                for k in range(3)]
        J = jnp.stack(cols, axis=-1)                  # [B, T, 3]
        JtJ = jnp.einsum("btk,btl->bkl", J, J)
        Jtr = jnp.einsum("btk,bt->bk", J, r)
        if view_axis is not None:
            JtJ = jax.lax.psum(JtJ, view_axis)
            Jtr = jax.lax.psum(Jtr, view_axis)
        damped = JtJ + ((lam + 1e-9)[:, None, None]
                        * jnp.eye(3, dtype=p.dtype)[None])
        delta = _solve3x3(damped, -Jtr)
        delta = jnp.clip(delta, -4.0, 4.0)
        p_new = p + delta
        p_new = p_new.at[:, 1:].set(
            jnp.clip(p_new[:, 1:], -ANGLE_BOUND, ANGLE_BOUND))
        f_new, r_new, _ = residuals(p_new)
        accept = (f_new < f) & active
        p = jnp.where(accept[:, None], p_new, p)
        r = jnp.where(accept[:, None], r_new, r)
        lam = jnp.where(accept, lam * 0.3, lam * 4.0)
        lam = jnp.clip(lam, 1e-5, 1e4)
        f = jnp.where(accept, f_new, f)
        return (p, f, r, lam), None

    # derive from f0 so the initial carry inherits its sharding/vma under
    # shard_map (a literal full() would be replicated and fail the scan
    # carry type check)
    lam0 = jnp.zeros_like(f0) + 1e-3
    (p, f, _, _), _ = jax.lax.scan(step, (p0, f0, r0, lam0),
                                   None, length=num_iters)

    new_coord, new_normal = decode_params(cams, prob, p)
    new_coord = jnp.where(active[:, None], new_coord, coord)
    new_normal = jnp.where(active[:, None], new_normal, normal)
    ncc = compute_weighted_incc(cams, pyr, level, wsize, prob, new_coord,
                                new_normal, view_axis=view_axis) \
        if with_ncc else None
    return new_coord, new_normal, ncc, f


def compute_weighted_incc(cams, pyr, level, wsize, prob: RefineProblem,
                          coord, normal, view_axis: str | None = None):
    """patch._ncc = 1 - unrobustincc(weighted robust INCC)
    (reference optim.cpp:652 + computeINCC :875-938, non-pairwise path)."""
    incc, ref_ok, pair_ok = per_view_inccs(cams, pyr, level, wsize, prob,
                                           coord, normal)
    w = jnp.where(pair_ok, prob.weights, 0.0)
    total = w.sum(axis=-1)
    num = (incc * w).sum(axis=-1)
    if view_axis is not None:
        total = jax.lax.psum(total, view_axis)
        num = jax.lax.psum(num, view_axis)
    score = num / jnp.where(total == 0.0, 1.0, total)
    score = jnp.where((total == 0.0) | (~ref_ok), 2.0, score)
    return 1.0 - unrobustincc(score)
