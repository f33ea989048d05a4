"""Feature detection vs a direct transcription of the reference loops."""
import numpy as np
import jax.numpy as jnp

from cmvs_pmvs_tpu.ops.detect import (
    bucket_topk, detect_features, gauss_kernel, harris_response,
)


def ref_harris(img: np.ndarray, sigma=4.0) -> np.ndarray:
    """Direct reimplementation of CHarris (harris.cpp:49-172), unmasked
    path with zero-padding borders."""
    I = img.astype(np.float64) / 255.0
    h, w = I.shape[:2]

    def convx(a, k):
        m = len(k) // 2
        out = np.zeros_like(a)
        for j, kv in enumerate(k):
            sh = j - m
            lo, hi = max(0, -sh), min(w, w - sh)
            out[:, lo:hi] += kv * a[:, lo + sh:hi + sh]
        return out

    def convy(a, k):
        m = len(k) // 2
        out = np.zeros_like(a)
        for j, kv in enumerate(k):
            sh = j - m
            lo, hi = max(0, -sh), min(h, h - sh)
            out[lo:hi] += kv * a[lo + sh:hi + sh]
        return out

    d3 = np.array([-0.5, 0.0, 0.5])
    b3 = np.array([1 / 3.0] * 3)
    dIdx = convy(convx(I, d3), b3)
    dIdy = convy(convx(I, b3), d3)
    dxx = (dIdx * dIdx).sum(-1)
    dyy = (dIdy * dIdy).sum(-1)
    dxy = (dIdx * dIdy).sum(-1)
    g = gauss_kernel(sigma).astype(np.float64)
    dxx = convy(convx(dxx[..., None], g), g)[..., 0]
    dyy = convy(convx(dyy[..., None], g), g)[..., 0]
    dxy = convy(convx(dxy[..., None], g), g)[..., 0]
    resp = dxx * dyy - dxy * dxy - 0.06 * (dxx + dyy) ** 2
    out = resp.copy()
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            if (resp[y, x] < resp[y, x + 1] or resp[y, x] < resp[y, x - 1]
                    or resp[y, x] < resp[y + 1, x]
                    or resp[y, x] < resp[y - 1, x]):
                out[y, x] = 0.0
    return out


def test_harris_matches_reference(rng):
    img = rng.integers(0, 256, size=(40, 48, 3)).astype(np.float64)
    got = np.asarray(harris_response(
        jnp.asarray(img[None], jnp.float32),
        jnp.ones((1, 40, 48), jnp.float32)))[0]
    want = ref_harris(img)
    # compare response maps where not suppressed; f32 vs f64 tolerance
    np.testing.assert_allclose(got, want, atol=5e-4)


def test_bucket_topk():
    resp = np.zeros((1, 8, 8), np.float32)
    # 6 candidates in bucket (0,0) with gridsize 8 -> keep top 4
    vals = [(0, 0, 5.0), (1, 1, 9.0), (2, 2, 3.0), (3, 3, 7.0),
            (4, 4, 1.0), (5, 5, 8.0)]
    for x, y, v in vals:
        resp[0, y, x] = v
    x, y, r, ok = bucket_topk(jnp.asarray(resp), jnp.asarray(resp) > 0, 8)
    got = sorted(np.asarray(r)[0][np.asarray(ok)[0]], reverse=True)
    assert got == [9.0, 8.0, 7.0, 5.0]


def test_detect_features_on_texture(rng):
    img = rng.integers(0, 256, size=(96, 128, 3)).astype(np.uint8)
    feats = detect_features(
        jnp.asarray(img[None], jnp.float32),
        jnp.ones((1, 96, 128), jnp.float32),
        jnp.asarray([128]), jnp.asarray([96]), fcsize=16)
    ok = np.asarray(feats["valid"])[0]
    assert ok.sum() > 20
    x = np.asarray(feats["x"])[0][ok]
    y = np.asarray(feats["y"])[0][ok]
    t = np.asarray(feats["type"])[0][ok]
    assert x.max() < 128 and y.max() < 96
    assert (t == 0).sum() > 0 and (t == 1).sum() > 0
    # margins respected: harris >= 8
    assert x[t == 0].min() >= 8 and y[t == 0].min() >= 8
