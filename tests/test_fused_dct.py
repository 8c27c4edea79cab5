"""Tests for the folded fused luma+DCT Pallas kernel (ops/fused_dct.py).

Runs the kernel in Pallas interpret mode on CPU and checks it against the
plain XLA formulation (colorspace.rgb_to_luma + dct.dct2_pass), the layout
index map, the mapped ranking, and the full pipeline dispatch.

The kernel replaces the reference's serial per-row DCT prologue
(reference: src/algorithm.rs:308-342, src/dct2d.rs:83-219) on TPU; these
tests pin its numerics so the on-chip path is covered by the same contract
as the XLA path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spread_spectrum_watermarking_tpu as wm
from spread_spectrum_watermarking_tpu.config import (
    Precision, ReadConfig, WriteConfig)
from spread_spectrum_watermarking_tpu.models import pipeline
from spread_spectrum_watermarking_tpu.ops import (
    colorspace, dct, fused_dct, ranking)


def _rand_rgb(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))


def _xla_pass(rgb, precision):
    y = colorspace.rgb_to_luma(rgb.astype(jnp.float32) / 255.0)
    return dct.dct2_pass(y, axis=-2, precision=precision)


@pytest.mark.parametrize("h,w", [(64, 128), (128, 384), (444, 640)])
def test_fold_pass_matches_xla(h, w):
    rgb = _rand_rgb(2, h, w)
    folded = fused_dct.luma_fold_row_pass(rgb, Precision.HIGH, interpret=True)
    got = fused_dct.unfold_rows(folded, h)
    ref = _xla_pass(rgb, Precision.HIGHEST)
    # HIGH is a 3-pass bf16 tier; compare against the f32 oracle with the
    # tier's tolerance and require the kernel to be at least as accurate as
    # XLA's own HIGH pass.
    xla_high_err = float(jnp.abs(_xla_pass(rgb, Precision.HIGH) - ref).max())
    kernel_err = float(jnp.abs(got - ref).max())
    assert kernel_err <= max(xla_high_err * 1.5, 1e-3 * float(jnp.abs(ref).max()))


@pytest.mark.parametrize("h,w", [(64, 128), (111, 384), (444, 640)])
def test_dense_pass_matches_xla(h, w):
    """The production dense kernel (true row order, odd H allowed)."""
    rgb = _rand_rgb(2, h, w, seed=1)
    got = fused_dct.luma_row_pass(rgb, Precision.HIGH, interpret=True)
    assert got.shape == (2, h, w)
    ref = _xla_pass(rgb, Precision.HIGHEST)
    xla_high_err = float(jnp.abs(_xla_pass(rgb, Precision.HIGH) - ref).max())
    kernel_err = float(jnp.abs(got - ref).max())
    assert kernel_err <= max(xla_high_err * 1.5, 1e-3 * float(jnp.abs(ref).max()))


def test_fold_pass_default_precision():
    h, w = 64, 128
    rgb = _rand_rgb(1, h, w, seed=3)
    folded = fused_dct.luma_fold_row_pass(rgb, Precision.DEFAULT,
                                          interpret=True)
    got = fused_dct.unfold_rows(folded, h)
    ref = _xla_pass(rgb, Precision.HIGHEST)
    scale = float(jnp.abs(ref).max())
    # single bf16 dot: ~2^-8 relative
    assert float(jnp.abs(got - ref).max()) < 0.02 * scale


def test_true_index_map():
    h, w = 444, 640
    kp = fused_dct.kp_for(h)
    m = fused_dct.true_index_map(h, w)
    assert m.shape == (2 * kp, w)
    # even block
    assert m[0, 0] == 0
    assert m[1, 5] == 2 * w + 5
    # odd block
    assert m[kp, 0] == w
    assert m[kp + 3, 7] == 7 * w + 7
    # padding rows -> sentinel
    assert (m[h // 2: kp] == h * w).all()
    assert (m[kp + h // 2:] == h * w).all()
    # bijection over valid entries
    valid = np.asarray(m[m < h * w])
    assert valid.size == h * w
    assert np.unique(valid).size == h * w


def test_mapped_ranking_consistent_with_plain():
    h, w = 64, 128
    rng = np.random.default_rng(7)
    plane = jnp.asarray(rng.normal(size=(2, h, w)).astype(np.float32))
    kp = fused_dct.kp_for(h)
    # fold the plane's rows into the kernel's layout
    pad = jnp.zeros((2, kp - h // 2, w), plane.dtype)
    folded = jnp.concatenate(
        [plane[:, 0::2], pad, plane[:, 1::2], pad], axis=1)
    imap = jnp.asarray(fused_dct.true_index_map(h, w))
    for ordering in (wm.Ordering.ENERGY, wm.Ordering.ENERGY_ORTHOGONAL,
                     wm.Ordering.LEGACY):
        tidx, lidx = ranking.approx_top_indices_mapped(
            folded, 100, ordering, imap, h, w)
        exact = ranking.top_indices(plane, 100, ordering)
        # layout positions map back to the returned true indices
        assert (jnp.take(imap.reshape(-1), lidx) == tidx).all()
        # approx recall against the exact ranking
        recall = np.mean([
            np.isin(np.asarray(tidx[i]), np.asarray(exact[i])).mean()
            for i in range(2)
        ])
        assert recall > 0.9, f"{ordering}: recall {recall}"
        assert not (tidx == 0).any()  # DC excluded
        assert (tidx < h * w).all()  # no padding sentinel selected


@pytest.mark.parametrize("fold", [False, True])
def test_pipeline_fused_dispatch_roundtrip(cat_image, fold):
    """Full embed+extract through the Pallas path (interpret mode) is
    detection-equivalent to the plain fast path, for both the dense
    (production) and folded kernel variants."""
    rgb = jnp.asarray(cat_image)[None]
    key = jax.random.PRNGKey(11)
    mark = wm.generate_normal(key, 1000)
    wcfg = WriteConfig(precision=Precision.HIGH)
    rcfg = ReadConfig(precision=Precision.HIGH)

    marked_plain = pipeline.embed(rgb, mark, wcfg)
    ext_plain = pipeline.extract(rgb, marked_plain, 1000, rcfg)
    sim_plain = float(pipeline.similarity(ext_plain[0], mark[None])[0])

    fused_dct._FORCE_INTERPRET = True
    fused_dct.USE_FOLD = fold
    jax.clear_caches()
    try:
        assert fused_dct.supported(rgb.shape, rgb.dtype, Precision.HIGH,
                                   fold=fold)
        marked = pipeline.embed(rgb, mark, wcfg)
        ext = pipeline.extract(rgb, marked, 1000, rcfg)
        sim = float(pipeline.similarity(ext[0], mark[None])[0])
    finally:
        fused_dct._FORCE_INTERPRET = False
        fused_dct.USE_FOLD = False
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


def test_supported_gates():
    assert not fused_dct.supported((1, 65, 128, 3), jnp.uint8,
                                   Precision.HIGH, fold=True)  # odd H: no fold
    assert not fused_dct.supported((1, 128, 64, 3), jnp.uint8,
                                   Precision.HIGH)  # portrait
    assert not fused_dct.supported((1, 64, 128, 3), jnp.float32,
                                   Precision.HIGH)  # not u8
    assert not fused_dct.supported((1, 64, 128, 3), jnp.uint8,
                                   Precision.HIGHEST)  # exact tier
