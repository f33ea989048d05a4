"""Fan-kernel (ops/pallas_fan) correctness in interpret mode.

The TPU refine fast path never runs in CPU CI; these tests execute the
Pallas fan kernel through the Mosaic interpreter on tiny batches and
check it against the pure-XLA reference formulation.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

import cmvs_pmvs_tpu.ops.refine as R
from cmvs_pmvs_tpu.geom import build_camera_set
from cmvs_pmvs_tpu.image import build_pyramids
from cmvs_pmvs_tpu.image.pyramid import with_tiles
from cmvs_pmvs_tpu.ops.pallas_fan import (
    build_tiles, fan_geometry, incc_fan)
from cmvs_pmvs_tpu.ops.refine import (
    make_problem, per_view_inccs, refine_patches, set_scales)
from cmvs_pmvs_tpu.utils.synthetic import make_plane_scene

BATCH = 48


@pytest.fixture(scope="module")
def setup():
    scene = make_plane_scene(num_cameras=6, width=160, height=120,
                             focal=200.0)
    cams = build_camera_set(scene.P, dtype=jnp.float32)
    pyr = build_pyramids(list(scene.images), None, num_levels=3)
    pyr = with_tiles(pyr)

    rng = np.random.default_rng(0)
    C = scene.centers[0]
    P = scene.P[0]
    us = rng.uniform(40, 120, BATCH)
    vs = rng.uniform(30, 90, BATCH)
    X1 = np.linalg.solve(
        P[:, :3],
        (np.stack([us, vs, np.ones(BATCH)], 0) - P[:, 3:4])).T
    d = X1 - C
    s = -(C @ scene.plane_n) / (d @ scene.plane_n)
    pts = C + s[:, None] * d
    coord = jnp.asarray(np.concatenate([pts, np.ones((BATCH, 1))], 1),
                        jnp.float32)
    normal = jnp.asarray(np.tile(np.append(scene.plane_n, 0.0),
                                 (BATCH, 1)), jnp.float32)
    views = jnp.tile(jnp.arange(6, dtype=jnp.int32)[None], (BATCH, 1))
    valid = jnp.ones((BATCH, 6), bool)
    dscale, _ = set_scales(cams, 0, 7, coord, views, valid)
    prob = make_problem(cams, 0, coord, normal, views, valid, dscale, 3)
    return scene, cams, pyr, coord, normal, prob, dscale


def test_incc_fan_matches_xla(setup):
    scene, cams, pyr, coord, normal, prob, _ = setup
    fan = 4
    cf = jnp.stack([coord] * fan)
    nf = jnp.stack([normal] * fan)
    tilemap, geom, ok = fan_geometry(cams, pyr, 0, 7, prob.views,
                                     prob.view_valid, cf, nf)
    with pltpu.force_tpu_interpret_mode():
        out = incc_fan(pyr.tiles, tilemap, geom, ppv=4, t=6, fan=fan,
                       s2=49, wsize=7)

    R.USE_PALLAS_INCC = False
    incc_ref, ref_ok, pair_ok = per_view_inccs(cams, pyr, 0, 7, prob,
                                               coord, normal)
    got = jnp.where(ok[:, :, 0] & ok[:, 0:1, 0], out[:, :, 0], 2.0)
    mask = np.asarray(pair_ok)
    diff = np.abs(np.asarray(got) - np.asarray(incc_ref))[mask]
    assert diff.max() < 1e-4
    # identical params in every fan slot -> identical INCCs
    for f in range(1, fan):
        d2 = np.abs(np.asarray(out[:, :, f] - out[:, :, 0]))[mask]
        assert d2.max() == 0.0


def test_incc_fan_fast_mode_close(setup):
    """The bf16-stored fast path tracks the precise path: intermediate
    rounding moves pair INCCs by well under the LM acceptance noise
    floor."""
    scene, cams, pyr, coord, normal, prob, _ = setup
    fan = 4
    cf = jnp.stack([coord] * fan)
    nf = jnp.stack([normal] * fan)
    tilemap, geom, ok = fan_geometry(cams, pyr, 0, 7, prob.views,
                                     prob.view_valid, cf, nf)
    with pltpu.force_tpu_interpret_mode():
        precise = incc_fan(pyr.tiles, tilemap, geom, ppv=4, t=6, fan=fan,
                           s2=49, wsize=7, precise=True)
        fast = incc_fan(pyr.tiles, tilemap, geom, ppv=4, t=6, fan=fan,
                        s2=49, wsize=7, precise=False)
    mask = np.asarray(ok & ok[:, 0:1, :])
    diff = np.abs(np.asarray(fast) - np.asarray(precise))[mask]
    assert diff.max() < 2e-2
    assert diff.mean() < 2e-3


def test_fan_refine_converges(setup):
    """The fan LM loop recovers a perturbed plane like the XLA path."""
    scene, cams, pyr, coord, normal, prob, dscale = setup
    ray = coord - cams.center[jnp.zeros(BATCH, jnp.int32)]
    ray = ray / jnp.linalg.norm(ray[:, :3], axis=1, keepdims=True)
    rng = np.random.default_rng(1)
    noise = jnp.asarray(rng.uniform(-1.5, 1.5, BATCH)[:, None],
                        jnp.float32)
    coord0 = coord + noise * dscale[:, None] * ray
    prob0 = make_problem(cams, 0, coord0, normal,
                         prob.views, prob.view_valid, dscale, 3)

    R.USE_PALLAS_INCC = True
    try:
        with pltpu.force_tpu_interpret_mode():
            c_fan, n_fan, ncc_fan, f_fan = refine_patches(
                cams, pyr, 0, 7, prob0, coord0, normal, num_iters=6)
    finally:
        R.USE_PALLAS_INCC = None

    # plane distance in dscale units
    off = scene.plane_distance(np.asarray(c_fan)[:, :3]) \
        / np.asarray(dscale)
    off0 = scene.plane_distance(np.asarray(coord0)[:, :3]) \
        / np.asarray(dscale)
    assert float(np.median(off)) < 0.15
    assert float(np.median(off)) < 0.3 * float(np.median(off0))
    assert float(jnp.median(ncc_fan)) > 0.9


def test_incc_fan_chunked_matches_single(setup, monkeypatch):
    """Above MAX_SMEM_PAIRS the batch splits over lax.map chunks; the
    chunked path must be bit-identical to the single-call path (round-3
    SMEM overflow fix: full-scene seed commit is ~1M pairs vs the 256Ki
    SMEM scalar-prefetch budget)."""
    import cmvs_pmvs_tpu.ops.pallas_fan as PF
    scene, cams, pyr, coord, normal, prob, _ = setup
    fan = 4
    cf = jnp.stack([coord] * fan)
    nf = jnp.stack([normal] * fan)
    tilemap, geom, ok = fan_geometry(cams, pyr, 0, 7, prob.views,
                                     prob.view_valid, cf, nf)
    # bypass the jit cache (keyed on shapes, not on the budget constant)
    raw = PF.incc_fan.__wrapped__
    with pltpu.force_tpu_interpret_mode():
        single = raw(pyr.tiles, tilemap, geom, ppv=4, t=6, fan=fan,
                     s2=49, wsize=7, precise=True)
        # 96-pair budget with t=6, ppv=4 -> max_b=16 patches: BATCH=48
        # splits into 3 chunks
        monkeypatch.setattr(PF, "MAX_SMEM_PAIRS", 96)
        chunked = raw(pyr.tiles, tilemap, geom, ppv=4, t=6, fan=fan,
                      s2=49, wsize=7, precise=True)
        # non-divisible budget: max_b=20 -> 3 chunks with a padded tail
        monkeypatch.setattr(PF, "MAX_SMEM_PAIRS", 124)
        chunked2 = raw(pyr.tiles, tilemap, geom, ppv=4, t=6, fan=fan,
                       s2=49, wsize=7, precise=True)
    assert single.shape == chunked.shape == chunked2.shape
    np.testing.assert_array_equal(np.asarray(single), np.asarray(chunked))
    np.testing.assert_array_equal(np.asarray(single),
                                  np.asarray(chunked2))


def test_incc_fan2_matches_xla(setup):
    """The sample-major v2 kernel (ops/pallas_fan2) reproduces the
    pure-XLA INCCs like v1 does."""
    from cmvs_pmvs_tpu.ops.pallas_fan2 import fan_geometry2, incc_fan2
    scene, cams, pyr, coord, normal, prob, _ = setup
    fan = 4
    cf = jnp.stack([coord] * fan)
    nf = jnp.stack([normal] * fan)
    tilemap, rel, ok = fan_geometry2(cams, pyr, 0, 7, prob.views,
                                     prob.view_valid, cf, nf)
    with pltpu.force_tpu_interpret_mode():
        out = incc_fan2(pyr.tiles2, tilemap, rel, ppv=4, t=6, fan=fan,
                        s2=49, wsize=7)

    R.USE_PALLAS_INCC = False
    incc_ref, ref_ok, pair_ok = per_view_inccs(cams, pyr, 0, 7, prob,
                                               coord, normal)
    got = jnp.where(ok[:, :, 0] & ok[:, 0:1, 0], out[:, :, 0], 2.0)
    mask = np.asarray(pair_ok)
    diff = np.abs(np.asarray(got) - np.asarray(incc_ref))[mask]
    assert diff.max() < 1e-4
    # identical params in every fan slot -> identical INCCs
    for f in range(1, fan):
        d2 = np.abs(np.asarray(out[:, :, f] - out[:, :, 0]))[mask]
        assert d2.max() == 0.0


def test_incc_fan2_matches_v1(setup):
    """v1 and v2 kernels agree pair-by-pair in precise mode (same
    robust-INCC contract, different layouts) and v2 fast mode stays
    within the LM acceptance noise floor."""
    from cmvs_pmvs_tpu.ops.pallas_fan import fan_geometry, incc_fan
    from cmvs_pmvs_tpu.ops.pallas_fan2 import fan_geometry2, incc_fan2
    scene, cams, pyr, coord, normal, prob, dscale = setup
    fan = 4
    rng = np.random.default_rng(7)
    ray = coord - cams.center[jnp.zeros(BATCH, jnp.int32)]
    ray = ray / jnp.linalg.norm(ray[:, :3], axis=1, keepdims=True)
    cf = jnp.stack([coord + (0.3 * k) * dscale[:, None] * ray
                    for k in range(fan)])
    nf = jnp.stack([normal] * fan)
    tilemap, geom, ok1 = fan_geometry(cams, pyr, 0, 7, prob.views,
                                      prob.view_valid, cf, nf)
    tilemap2, rel, ok2 = fan_geometry2(cams, pyr, 0, 7, prob.views,
                                       prob.view_valid, cf, nf)
    np.testing.assert_array_equal(np.asarray(tilemap),
                                  np.asarray(tilemap2))
    np.testing.assert_array_equal(np.asarray(ok1), np.asarray(ok2))
    with pltpu.force_tpu_interpret_mode():
        v1 = incc_fan(pyr.tiles, tilemap, geom, ppv=4, t=6, fan=fan,
                      s2=49, wsize=7, precise=True)
        v2 = incc_fan2(pyr.tiles2, tilemap2, rel, ppv=4, t=6, fan=fan,
                       s2=49, wsize=7, precise=True)
        v2f = incc_fan2(pyr.tiles2, tilemap2, rel, ppv=4, t=6, fan=fan,
                        s2=49, wsize=7, precise=False)
    mask = np.asarray(ok1 & ok1[:, 0:1, :])
    d = np.abs(np.asarray(v1) - np.asarray(v2))[mask]
    assert d.max() < 2e-4
    df = np.abs(np.asarray(v2f) - np.asarray(v2))[mask]
    assert df.max() < 2e-2
    assert df.mean() < 2e-3


def test_incc_fan2_chunked_matches_single(setup, monkeypatch):
    """The v2 chunked path is bit-identical to the single-call path."""
    import cmvs_pmvs_tpu.ops.pallas_fan2 as PF2
    from cmvs_pmvs_tpu.ops.pallas_fan2 import fan_geometry2
    scene, cams, pyr, coord, normal, prob, _ = setup
    fan = 4
    cf = jnp.stack([coord] * fan)
    nf = jnp.stack([normal] * fan)
    tilemap, rel, ok = fan_geometry2(cams, pyr, 0, 7, prob.views,
                                     prob.view_valid, cf, nf)
    raw = PF2.incc_fan2.__wrapped__
    with pltpu.force_tpu_interpret_mode():
        single = raw(pyr.tiles2, tilemap, rel, ppv=4, t=6, fan=fan,
                     s2=49, wsize=7, precise=True)
        monkeypatch.setattr(PF2, "MAX_SMEM_PAIRS", 96)
        chunked = raw(pyr.tiles2, tilemap, rel, ppv=4, t=6, fan=fan,
                      s2=49, wsize=7, precise=True)
        monkeypatch.setattr(PF2, "MAX_SMEM_PAIRS", 124)
        chunked2 = raw(pyr.tiles2, tilemap, rel, ppv=4, t=6, fan=fan,
                       s2=49, wsize=7, precise=True)
    assert single.shape == chunked.shape == chunked2.shape
    # v2's moment algebra runs in XLA per chunk shape, so reduction
    # fusion (and thus f32 rounding) may differ slightly between the
    # single and chunked compilations - tight allclose, not bit-equal
    np.testing.assert_allclose(np.asarray(single), np.asarray(chunked),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(single), np.asarray(chunked2),
                               atol=5e-5)


def test_incc_fan2_pack2_fan1_matches_xla(setup):
    """fan=1 packs two pairs per 128-lane block (s2pl == 64); the duo
    block-diagonal y-interp must reproduce the pure-XLA INCCs exactly
    like the plain layout does."""
    from cmvs_pmvs_tpu.ops.pallas_fan2 import fan_geometry2, incc_fan2, s2pl
    scene, cams, pyr, coord, normal, prob, _ = setup
    assert s2pl(49, 1) == 64
    tilemap, frames, ok = fan_geometry2(cams, pyr, 0, 7, prob.views,
                                        prob.view_valid, coord[None],
                                        normal[None])
    with pltpu.force_tpu_interpret_mode():
        out = incc_fan2(pyr.tiles2, tilemap, frames, ppv=4, t=6, fan=1,
                        s2=49, wsize=7)

    R.USE_PALLAS_INCC = False
    incc_ref, ref_ok, pair_ok = per_view_inccs(cams, pyr, 0, 7, prob,
                                               coord, normal)
    got = jnp.where(ok[:, :, 0] & ok[:, 0:1, 0], out[:, :, 0], 2.0)
    mask = np.asarray(pair_ok)
    diff = np.abs(np.asarray(got) - np.asarray(incc_ref))[mask]
    assert diff.max() < 1e-4
