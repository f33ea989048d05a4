"""Pyramid build and subpixel sampling vs a direct reimplementation of the
reference loops (source/image/image.cpp:228-405, image.hpp:434-499)."""
import numpy as np
import jax.numpy as jnp

from cmvs_pmvs_tpu.image import (
    build_pyramids, bilinear_color, mask_at, edge_at, mask_all,
)


def ref_downsample(img: np.ndarray) -> np.ndarray:
    """Direct transcription of CImage::buildImage filter==0
    (image.cpp:228-325) for one level step."""
    h, w = img.shape[:2]
    oh, ow = h // 2, w // 2
    k1 = np.array([1.0, 3.0, 3.0, 1.0]) / 8.0
    k = np.outer(k1, k1)
    out = np.zeros((oh, ow, 3))
    for y in range(oh):
        for x in range(ow):
            color = np.zeros(3)
            denom = 0.0
            for j in range(-1, 3):
                yt = 2 * y + j
                if yt < 0 or yt > h - 2:
                    continue
                for i in range(-1, 3):
                    xt = 2 * x + i
                    if xt < 0 or xt > w - 2:
                        continue
                    color += k[j + 1, i + 1] * img[yt, xt]
                    denom += k[j + 1, i + 1]
            out[y, x] = np.floor(color / denom + 0.5)
    return out


def test_pyramid_matches_reference_loop(rng):
    img = rng.integers(0, 256, size=(21, 17, 3)).astype(np.uint8)
    pyr = build_pyramids([img], None, num_levels=3)
    lv1 = ref_downsample(img.astype(np.float64))
    lv2 = ref_downsample(lv1)

    # extract level 1 from the atlas
    a = np.asarray(pyr.atlas)
    x1 = int(pyr.xoff[1]); w1, h1 = 17 // 2, 21 // 2
    got1 = a[0, :h1, x1:x1 + w1]
    np.testing.assert_array_equal(got1, lv1)

    x2 = int(pyr.xoff[2]); w2, h2 = w1 // 2, h1 // 2
    got2 = a[0, :h2, x2:x2 + w2]
    np.testing.assert_array_equal(got2, lv2)


def test_pyramid_mixed_sizes(rng):
    imgs = [rng.integers(0, 256, size=(32, 40, 3)).astype(np.uint8),
            rng.integers(0, 256, size=(24, 20, 3)).astype(np.uint8)]
    pyr = build_pyramids(imgs, None, num_levels=2)
    assert list(np.asarray(pyr.widths[:, 0])) == [40, 20]
    assert list(np.asarray(pyr.widths[:, 1])) == [20, 10]
    a = np.asarray(pyr.atlas)
    x1 = int(pyr.xoff[1])
    np.testing.assert_array_equal(
        a[1, :12, x1:x1 + 10], ref_downsample(imgs[1].astype(np.float64)))


def test_mask_any_in(rng):
    img = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    mask = np.zeros((8, 8), dtype=np.uint8)
    mask[0, 0] = 255  # one in-pixel makes its level-1 cell "in"
    pyr = build_pyramids([img], [mask], num_levels=2)
    m = np.asarray(pyr.mask_atlas)
    x1 = int(pyr.xoff[1])
    lv1 = m[0, :4, x1:x1 + 4]
    assert lv1[0, 0] == 1.0
    assert lv1.sum() == 1.0


def test_bilinear_sampling(rng):
    img = rng.integers(0, 256, size=(16, 16, 3)).astype(np.uint8)
    pyr = build_pyramids([img], None, num_levels=1)
    # exact at integer coords
    c = bilinear_color(pyr, jnp.asarray(0), jnp.asarray(0),
                       jnp.asarray(3.0), jnp.asarray(5.0))
    np.testing.assert_allclose(np.asarray(c), img[5, 3], atol=1e-4)
    # halfway between two pixels
    c2 = bilinear_color(pyr, jnp.asarray(0), jnp.asarray(0),
                        jnp.asarray(3.5), jnp.asarray(5.0))
    expected = (img[5, 3].astype(np.float64) + img[5, 4]) / 2.0
    np.testing.assert_allclose(np.asarray(c2), expected, atol=1e-4)
    # batched: [K] samples
    xs = jnp.asarray([1.25, 2.5, 7.75])
    ys = jnp.asarray([3.5, 0.25, 9.0])
    out = bilinear_color(pyr, jnp.zeros(3, jnp.int32),
                         jnp.zeros(3, jnp.int32), xs, ys)
    assert out.shape == (3, 3)


def test_bilinear_level1_from_atlas(rng):
    img = rng.integers(0, 256, size=(20, 20, 3)).astype(np.uint8)
    pyr = build_pyramids([img], None, num_levels=2)
    lv1 = ref_downsample(img.astype(np.float64))
    c = bilinear_color(pyr, jnp.asarray(0), jnp.asarray(1),
                       jnp.asarray(2.5), jnp.asarray(3.0))
    expected = (lv1[3, 2] + lv1[3, 3]) / 2.0
    np.testing.assert_allclose(np.asarray(c), expected, atol=1e-4)


def test_mask_out_of_bounds_passes(rng):
    img = rng.integers(0, 256, size=(8, 8, 3)).astype(np.uint8)
    mask = np.zeros((8, 8), dtype=np.uint8)
    pyr = build_pyramids([img], [mask], num_levels=1)
    # inside -> masked out (0); outside -> pass (1), image.hpp:553-564
    assert float(mask_at(pyr, 0, 0, 4.0, 4.0)) == 0.0
    assert float(mask_at(pyr, 0, 0, -5.0, 4.0)) == 1.0
    assert float(edge_at(pyr, 0, 0, 100.0, 4.0)) == 1.0


def test_bicubic_color_matches_reference_formula():
    """bicubic_color == the reference's a=-1 cubic convolution
    (image.hpp:282-433)."""
    import numpy as np
    import jax.numpy as jnp
    from cmvs_pmvs_tpu.image import build_pyramids
    from cmvs_pmvs_tpu.image.sample import bicubic_color

    rng = np.random.default_rng(2)
    img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    pyr = build_pyramids([img], None, num_levels=1)

    def ref_bicubic(x, y):
        x1, y1 = int(np.floor(x)), int(np.floor(y))
        p, q = x - x1, y - y1

        def w(f):
            f0 = 1 + f
            w0 = ((-f0 + 5) * f0 - 8) * f0 + 4
            w1 = (f - 2) * f * f + 1
            f2 = 1 - f
            w2 = (f2 - 2) * f2 * f2 + 1
            f3 = 2 - f
            w3 = ((-f3 + 5) * f3 - 8) * f3 + 4
            return [w0, w1, w2, w3]

        wx, wy = w(p), w(q)
        out = np.zeros(3)
        for j in range(4):
            for i in range(4):
                out += (wy[j] * wx[i]
                        * img[y1 + j - 1, x1 + i - 1].astype(float))
        return out

    for x, y in [(5.3, 7.8), (10.0, 3.25), (20.9, 15.1)]:
        got = np.asarray(bicubic_color(
            pyr, jnp.int32(0), jnp.int32(0),
            jnp.float32(x), jnp.float32(y)))
        assert np.allclose(got, ref_bicubic(x, y), atol=1e-2), (x, y)


def test_gamma_pyramid_decodes():
    """FURUKAWA_IMAGE_GAMMA variant: (v/255)^2.2 floats, no
    re-quantization of coarser levels (image.cpp:184-195)."""
    import numpy as np
    from cmvs_pmvs_tpu.image import build_pyramids

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16, 3)).astype(np.uint8)
    pyr = build_pyramids([img], None, num_levels=2, gamma=2.2)
    a0 = np.asarray(pyr.atlas[0, :16, :16])
    assert np.allclose(a0, (img / 255.0) ** 2.2, atol=1e-5)
    # level 1 stays fractional (not snapped to integers)
    x1 = int(pyr.xoff[1])
    a1 = np.asarray(pyr.atlas[0, :8, x1:x1 + 8])
    assert not np.allclose(a1, np.round(a1))
