"""Color space tests, mirroring reference src/yiq.rs:199-242 plus quantization."""

import jax.numpy as jnp
import numpy as np
import pytest

from spread_spectrum_watermarking_tpu.ops import colorspace


# Primary-color fixtures from reference src/yiq.rs:204-224.
PRIMARIES = [
    ([1.0, 0.0, 0.0], [0.30, 0.60, 0.21]),
    ([0.0, 1.0, 0.0], [0.59, -0.28, -0.52]),
    ([0.0, 0.0, 1.0], [0.11, -0.32, 0.31]),
    ([0.5, 0.5, 1.0], [0.555, -0.16, 0.155]),
]


@pytest.mark.parametrize("rgb,yiq", PRIMARIES)
def test_primary_roundtrip(rgb, yiq):
    got_yiq = np.asarray(colorspace.rgb_to_yiq(jnp.asarray([rgb], dtype=jnp.float32)))[0]
    np.testing.assert_allclose(got_yiq, yiq, atol=1e-4)
    got_rgb = np.asarray(colorspace.yiq_to_rgb(jnp.asarray([yiq], dtype=jnp.float32)))[0]
    np.testing.assert_allclose(got_rgb, rgb, atol=1e-4)


def test_image_roundtrip():
    # 5x5 image round trip with tolerance 0.001 (reference src/yiq.rs:227-241).
    rng = np.random.default_rng(3)
    img = rng.random((5, 5, 3), dtype=np.float32)
    yiq = colorspace.rgb_to_yiq(jnp.asarray(img))
    back = np.asarray(colorspace.yiq_to_rgb(yiq))
    np.testing.assert_allclose(back, img, atol=1e-3)


def test_yiq_to_rgb_clamps():
    # Out-of-gamut YIQ must clamp each RGB channel to [0,1]
    # (reference src/yiq.rs:139-147,174).
    yiq = jnp.asarray([[2.0, 1.0, 1.0], [-1.0, 0.0, 0.0]], dtype=jnp.float32)
    rgb = np.asarray(colorspace.yiq_to_rgb(yiq))
    assert rgb.min() >= 0.0 and rgb.max() <= 1.0
    assert rgb[0].max() == 1.0 and rgb[1].min() == 0.0


def test_rgb_to_yiq_does_not_clamp():
    rgb = jnp.asarray([[1.0, 0.0, 1.0]], dtype=jnp.float32)  # I/Q go out of [0,1]
    yiq = np.asarray(colorspace.rgb_to_yiq(rgb))
    assert yiq[0, 2] > 0.5  # q = 0.21 + 0.31
    rgb2 = jnp.asarray([[0.0, 1.0, 1.0]], dtype=jnp.float32)
    assert np.asarray(colorspace.rgb_to_yiq(rgb2))[0, 1] < 0.0  # negative I kept


def test_quantization_matches_image_crate():
    # into_rgb8 = round-half-away-from-zero of clamp(x,0,1)*255.
    vals = jnp.asarray([0.0, 1.0, 0.5, 1.5, -0.2, 0.0019607, 0.0019608, 0.49999, 0.998])
    got = np.asarray(colorspace.f32_to_u8(vals))
    # 0.0019607*255 = 0.49998 -> 0 ; 0.0019608*255 = 0.500004 -> 1
    np.testing.assert_array_equal(got, [0, 255, 128, 255, 0, 0, 1, 127, 254])
    # round-trip u8 -> f32 -> u8 is the identity
    u8 = jnp.arange(256, dtype=jnp.uint8)
    rt = np.asarray(colorspace.f32_to_u8(colorspace.u8_to_f32(u8)))
    np.testing.assert_array_equal(rt, np.arange(256, dtype=np.uint8))
    # host/device versions agree
    np.testing.assert_array_equal(
        colorspace.np_f32_to_u8(np.asarray(vals)), got)


def test_add_luma_delta_u8_matches_reference_form():
    # The integer-domain channel-planar epilogue must agree with the
    # reference-form clip(u8/255 + dy) -> into_rgb8 chain
    # (src/algorithm.rs:361-379 + examples/main.rs:278) on every byte,
    # including values driven past both clip boundaries.
    rng = np.random.default_rng(5)
    rgb = jnp.asarray(rng.integers(0, 256, (2, 33, 41, 3), dtype=np.uint8))
    dy = jnp.asarray(
        (rng.standard_normal((2, 33, 41)) * 0.01).astype(np.float32))
    # force some saturation on both sides
    dy = dy.at[0, 0, :].set(2.0).at[0, 1, :].set(-2.0)
    ref = colorspace.f32_to_u8(
        jnp.clip(colorspace.u8_to_f32(rgb) + dy[..., None], 0.0, 1.0))
    got = colorspace.add_luma_delta_u8(rgb, dy)
    diff = np.abs(np.asarray(ref).astype(np.int32)
                  - np.asarray(got).astype(np.int32))
    # identical math; f32 rounding can differ only at exact .5 boundaries,
    # which the random inputs here never hit.
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got)), diff.max()
