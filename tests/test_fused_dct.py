"""Tests for the fused Pallas prologue kernel (ops/fused_dct.py).

Runs the kernels in Pallas interpret mode on CPU and checks them against the
plain XLA formulations (colorspace + dct ops), the VMEM plans, and the full
pipeline dispatch.

The prologue replaces the reference's serial per-row DCT forward pass
(reference: src/algorithm.rs:308-342, src/dct2d.rs:83-219). These tests pin
the kernel numerics so the on-chip path is covered by the same contract as
the XLA path. (The epilogue kernel and the streamed-contraction branch were
deleted after losing their in-context A/Bs -- see ops/fused_dct.py docstring.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spread_spectrum_watermarking_tpu as wm
from spread_spectrum_watermarking_tpu.config import (
    Precision, ReadConfig, WriteConfig)
from spread_spectrum_watermarking_tpu.models import pipeline
from spread_spectrum_watermarking_tpu.ops import colorspace, dct, fused_dct


def _rand_rgb(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))


def _xla_pass(rgb, precision, h, w):
    y = colorspace.rgb_to_luma(rgb.astype(jnp.float32) / 255.0)
    ax = -2 if h <= w else -1
    return dct.dct2_pass(y, axis=ax, precision=precision)


# landscape, odd-H landscape, the reference cat, portrait, odd portrait
SHAPES = [(64, 128), (111, 384), (444, 640), (128, 64), (384, 111)]


@pytest.mark.parametrize("h,w", SHAPES)
def test_luma_pass_matches_xla_high(h, w):
    rgb = _rand_rgb(2, h, w, seed=1)
    got = fused_dct.luma_pass(rgb, Precision.HIGH, interpret=True)
    assert got.shape == (2, h, w)
    ref = _xla_pass(rgb, Precision.HIGHEST, h, w)
    # HIGH is a 3-pass bf16 tier; compare against the f32 oracle with the
    # tier's tolerance and require the kernel to be at least as accurate as
    # XLA's own HIGH pass.
    xla_high_err = float(jnp.abs(_xla_pass(rgb, Precision.HIGH, h, w) - ref).max())
    kernel_err = float(jnp.abs(got - ref).max())
    assert kernel_err <= max(xla_high_err * 1.5, 1e-3 * float(jnp.abs(ref).max()))


@pytest.mark.parametrize("h,w", [(64, 128), (128, 64)])
def test_luma_pass_default_precision(h, w):
    rgb = _rand_rgb(1, h, w, seed=3)
    got = fused_dct.luma_pass(rgb, Precision.DEFAULT, interpret=True)
    ref = _xla_pass(rgb, Precision.HIGHEST, h, w)
    scale = float(jnp.abs(ref).max())
    # single bf16 dot: ~2^-8 relative
    assert float(jnp.abs(got - ref).max()) < 0.02 * scale


def test_luma_pass_bf16_out():
    h, w = 64, 128
    rgb = _rand_rgb(1, h, w, seed=5)
    got = fused_dct.luma_pass(rgb, Precision.HIGH, out_dtype=jnp.bfloat16,
                              interpret=True)
    assert got.dtype == jnp.bfloat16
    ref = _xla_pass(rgb, Precision.HIGHEST, h, w)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(got.astype(jnp.float32) - ref).max()) < 0.02 * scale


def test_plans_production_shapes():
    # 1080p: resident basis at both tiers.
    for nd in (1, 3):
        plan = fused_dct._row_pass_plan(1080, 1920, nd, 2)
        assert plan is not None
        tw, kp, hp, wp = plan
        assert kp == hp == 1088, (nd, plan)
    # 4K DEFAULT: resident; 4K HIGH: no resident tiling fits (hi+lo basis
    # ~19 MB), so the plan is None and the XLA pass runs -- the streamed
    # variant that used to cover this config lost its in-context A/B
    # (2427 vs 2092 us/img) and was deleted.
    assert fused_dct._row_pass_plan(2160, 3840, 1, 2) is not None
    assert fused_dct._row_pass_plan(2160, 3840, 3, 2) is None
    # portrait 4K
    assert fused_dct._col_pass_plan(3840, 2160, 1, 2) is not None


def test_supported_gates():
    u8, f32 = jnp.uint8, jnp.float32
    fused_dct._FORCE_INTERPRET = True
    try:
        assert fused_dct.supported((1, 1080, 1920, 3), u8, Precision.HIGH)
        # 4K HIGH: hi+lo basis cannot stay resident -> XLA pass (the
        # streamed kernel variant lost its A/B and was deleted).
        assert not fused_dct.supported((1, 2160, 3840, 3), u8, Precision.HIGH)
        assert fused_dct.supported((1, 2160, 3840, 3), u8, Precision.DEFAULT)
        assert fused_dct.supported((1, 1920, 1080, 3), u8, Precision.DEFAULT)
        assert not fused_dct.supported((1, 64, 128, 3), f32, Precision.HIGH)
        assert not fused_dct.supported((1, 64, 128, 3), u8, Precision.HIGHEST)
        assert not fused_dct.supported((1, 16, 128, 3), u8, Precision.HIGH)
    finally:
        fused_dct._FORCE_INTERPRET = False


# ---------------------------------------------------------------------------
# Pipeline dispatch
# ---------------------------------------------------------------------------


def test_pipeline_fused_dispatch_roundtrip(cat_image):
    """Full embed+extract through the Pallas path (interpret mode) is
    detection-equivalent to the plain fast path."""
    rgb = jnp.asarray(cat_image)[None]
    key = jax.random.PRNGKey(11)
    mark = wm.generate_normal(key, 1000)
    wcfg = WriteConfig(precision=Precision.HIGH)
    rcfg = ReadConfig(precision=Precision.HIGH)

    marked_plain = pipeline.embed(rgb, mark, wcfg)
    ext_plain = pipeline.extract(rgb, marked_plain, 1000, rcfg)
    sim_plain = float(pipeline.similarity(ext_plain[0], mark[None])[0])

    fused_dct._FORCE_INTERPRET = True
    jax.clear_caches()
    try:
        assert fused_dct.supported(rgb.shape, rgb.dtype, Precision.HIGH)
        marked = pipeline.embed(rgb, mark, wcfg)
        ext = pipeline.extract(rgb, marked, 1000, rcfg)
        sim = float(pipeline.similarity(ext[0], mark[None])[0])
    finally:
        fused_dct._FORCE_INTERPRET = False
        jax.clear_caches()

    # both paths detect strongly and agree closely
    assert sim > 25.0
    assert abs(sim - sim_plain) < 1.5
    # visual-quality contract: the fused path's embedding distortion (vs the
    # original image) matches the plain path's. The two approx rankings may
    # swap a few boundary-energy coefficients, so the marked images are not
    # pixel-identical to each other -- but each must distort the original
    # equally little.
    base = np.asarray(rgb[0], np.int32)
    d_fused = np.abs(np.asarray(marked[0], np.int32) - base).mean()
    d_plain = np.abs(np.asarray(marked_plain[0], np.int32) - base).mean()
    assert abs(d_fused - d_plain) < 0.25 * max(d_plain, 0.5)
