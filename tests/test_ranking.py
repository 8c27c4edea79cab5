"""Ranking tests, mirroring reference src/algorithm.rs:717-727 and the
ortho-scaled orderings (src/algorithm.rs:235-280)."""

import jax.numpy as jnp
import numpy as np
import pytest

from spread_spectrum_watermarking_tpu.config import Ordering
from spread_spectrum_watermarking_tpu.ops import ranking


def test_indices_by_energy():
    # Reference test_indices (src/algorithm.rs:722-727): coefficients
    # [-3, 5, -8, 7, 1, 2] -> energy order (skipping DC) [2, 3, 1, 5, 4].
    coeffs = jnp.asarray([[-3.0, 5.0, -8.0, 7.0, 1.0, 2.0]])  # (1, 6) image
    idx = np.asarray(ranking.top_indices(coeffs, 5, Ordering.ENERGY))
    np.testing.assert_array_equal(idx, [2, 3, 1, 5, 4])


def test_indices_batched():
    coeffs = jnp.asarray([
        [[-3.0, 5.0, -8.0, 7.0, 1.0, 2.0]],
        [[0.0, 1.0, 2.0, 3.0, 4.0, 5.0]],
    ])  # (2, 1, 6)
    idx = np.asarray(ranking.top_indices(coeffs, 3, Ordering.ENERGY))
    np.testing.assert_array_equal(idx[0], [2, 3, 1])
    np.testing.assert_array_equal(idx[1], [5, 4, 3])


def test_dc_always_excluded():
    coeffs = jnp.asarray([[100.0, 1.0, 2.0, 3.0]])
    idx = np.asarray(ranking.top_indices(coeffs, 3, Ordering.ENERGY))
    assert 0 not in idx


def test_tie_break_lower_index_first():
    # Rust stable sort keeps ascending index order for equal energies.
    coeffs = jnp.asarray([[9.0, 2.0, -2.0, 2.0, 5.0]])
    idx = np.asarray(ranking.top_indices(coeffs, 4, Ordering.ENERGY))
    np.testing.assert_array_equal(idx, [4, 1, 2, 3])


def test_ortho_scale_map_matches_reference_formula():
    # Reproduce ordering_orthogonal's per-index scaling exactly
    # (src/algorithm.rs:240-267) with a scalar reimplementation.
    h, w = 4, 6
    scale = ranking._ortho_scale_map(h, w)
    s_k0_w = np.float32(np.sqrt(1.0 / (4.0 * w)))
    s_w = np.float32(np.sqrt(1.0 / (2.0 * w)))
    s_k0_h = np.float32(np.sqrt(1.0 / (4.0 * h)))
    s_h = np.float32(np.sqrt(1.0 / (2.0 * h)))
    for index in range(h * w):
        first_row = index < w
        first_col = (index % w) == 0
        want = (s_k0_w if first_row else s_w) * (s_k0_h if first_col else s_h)
        got = scale[index // w, index % w]
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_legacy_ordering_is_signed():
    # Legacy ranks by raw (ortho-scaled) value: most positive first,
    # negatives last -- the preserved 2013 bug (src/algorithm.rs:223-232).
    coeffs = jnp.asarray([[0.0, -100.0, 1.0, 50.0]])
    idx_legacy = np.asarray(ranking.top_indices(coeffs, 3, Ordering.LEGACY))
    # scale factors are positive, so order by value: 50 > 1 > -100
    np.testing.assert_array_equal(idx_legacy, [3, 2, 1])
    idx_energy = np.asarray(ranking.top_indices(coeffs, 3, Ordering.ENERGY))
    np.testing.assert_array_equal(idx_energy, [1, 3, 2])


def test_energy_orthogonal_changes_selection():
    # A coefficient on row/col 0 gets down-weighted by the ortho factors, so
    # near-ties flip between ENERGY and ENERGY_ORTHOGONAL.
    coeffs = np.zeros((4, 6), dtype=np.float32)
    coeffs[0, 2] = 10.0     # on first row -> scaled by s_k0... factor pair
    coeffs[2, 3] = 9.0      # interior
    idx_e = np.asarray(ranking.top_indices(jnp.asarray(coeffs), 1, Ordering.ENERGY))
    idx_o = np.asarray(
        ranking.top_indices(jnp.asarray(coeffs), 1, Ordering.ENERGY_ORTHOGONAL))
    assert idx_e[0] == 2          # raw energy picks the 10
    assert idx_o[0] == 2 * 6 + 3  # ortho rescale favors the interior 9


def test_tiled_fast_top_k_matches_exact():
    # The tiled hierarchical fast path must agree with exact lax.top_k,
    # including clustered energies (like real DCT spectra) and exact ties.
    rng = np.random.default_rng(3)
    n = 500
    flat = (rng.standard_normal((4, 80000)).astype(np.float32) ** 2) * \
        np.exp(rng.standard_normal((4, 80000)).astype(np.float32) * 4)
    flat[:, :2000] *= 1e4       # clustered strong region
    flat[0, 5000:5040] = flat[0, 50]  # cross-tile ties
    flat[1, ::97] = 1234.5
    flat[2, 60000:60100] = 0.0
    coeffs = jnp.asarray(flat.reshape(4, 200, 400))
    got = np.asarray(ranking.top_indices(coeffs, n, Ordering.ENERGY))
    want = np.asarray(
        ranking.top_indices(coeffs, n, Ordering.ENERGY, exact_only=True))
    np.testing.assert_array_equal(got, want)
    # ensure the fast path was actually eligible (size >= 4*n*tile)
    assert 80000 >= 4 * n * 32


def test_verified_fast_top_k_on_dct_like_input(cat_image):
    import jax
    from spread_spectrum_watermarking_tpu.ops import colorspace, dct

    y = colorspace.rgb_to_luma(jnp.asarray(cat_image, jnp.float32) / 255.0)
    coeffs = dct.dct2_2d(y)
    idx_fast = np.asarray(ranking.top_indices(coeffs, 1000, Ordering.ENERGY))
    idx_exact = np.asarray(
        ranking.top_indices(coeffs, 1000, Ordering.ENERGY, exact_only=True))
    np.testing.assert_array_equal(idx_fast, idx_exact)


def test_custom_ordering_metric_reproduces_legacy():
    # A user-supplied (flat_indices, values) -> metric callable must rank
    # identically to the built-in it reimplements -- the vectorized
    # equivalent of the reference's OrderingMethod::Custom comparator
    # (reference: src/algorithm.rs:150-151,166-167).
    rng = np.random.default_rng(11)
    coeffs = jnp.asarray(rng.standard_normal((2, 64, 96)).astype(np.float32))
    h, w = 64, 96

    def legacy_metric(flat_idx, vals):
        s_k0_w = np.float32(np.sqrt(1.0 / (4.0 * w)))
        s_w = np.float32(np.sqrt(1.0 / (2.0 * w)))
        s_k0_h = np.float32(np.sqrt(1.0 / (4.0 * h)))
        s_h = np.float32(np.sqrt(1.0 / (2.0 * h)))
        row_f = jnp.where(flat_idx < w, s_k0_w, s_w)
        col_f = jnp.where(flat_idx % w == 0, s_k0_h, s_h)
        return vals * (row_f * col_f)  # raw signed value: the 2013 bug

    got = np.asarray(ranking.top_indices(
        coeffs, 50, Ordering.ENERGY, custom_metric=legacy_metric))
    want = np.asarray(ranking.top_indices(coeffs, 50, Ordering.LEGACY))
    np.testing.assert_array_equal(got, want)


def test_custom_ordering_threads_through_pipeline():
    # Embed + extract with a custom metric in the configs round-trips: the
    # write and read paths derive the same indices from the same callable.
    from spread_spectrum_watermarking_tpu import embed, extract, similarity
    from spread_spectrum_watermarking_tpu.config import ReadConfig, WriteConfig

    def abs_metric(flat_idx, vals):
        return jnp.abs(vals)

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.integers(0, 256, (96, 128, 3), dtype=np.uint8))
    mark = jnp.asarray(rng.standard_normal(200).astype(np.float32))
    wcfg = WriteConfig(custom_ordering=abs_metric)
    rcfg = ReadConfig(custom_ordering=abs_metric)
    marked = embed(img, mark, wcfg)
    ext = extract(img, marked, 200, rcfg)
    sim = float(np.asarray(similarity(ext[None], mark[None]))[0, 0])
    assert sim > 10.0  # observed ~14.9 sigma on this 96x128 random image


def test_approx_dc_slot_value_guarded():
    # When n approaches the plane size the -inf-masked DC slot can enter the
    # approx_max_k selection; its reconstructed 'value' must come back as a
    # finite 0.0 (not -inf) so Option2/3's division by base values cannot
    # produce inf/NaN, and the slot must sort last (ADVICE r3 item 5).
    rng = np.random.default_rng(3)
    plane = jnp.asarray(rng.normal(size=(1, 8, 8)).astype(np.float32))
    idx, vals = ranking.approx_top_indices(plane, 64, Ordering.ENERGY)
    idx, vals = np.asarray(idx), np.asarray(vals)
    assert np.isfinite(vals).all(), vals
    assert idx[0, -1] == 0          # DC present (n == size) and ranked last
    assert vals[0, -1] == 0.0


def test_approx_rank_version_1_matches_recorded_legacy_semantics():
    # Generation 1 = plain bf16 metric keys + one value gather + f32-metric
    # re-sort: the returned values must be the PLANE's values at the indices
    # (not key reconstructions), bit-exactly.
    rng = np.random.default_rng(11)
    plane = jnp.asarray(rng.normal(size=(2, 32, 48)).astype(np.float32) * 50)
    idx, vals = ranking.approx_top_indices(plane, 40, Ordering.ENERGY,
                                           version=1)
    flat = np.asarray(plane).reshape(2, -1)
    np.testing.assert_array_equal(
        np.asarray(vals), np.take_along_axis(flat, np.asarray(idx), axis=-1))
    with pytest.raises(ValueError, match="rank_version"):
        ranking.approx_top_indices(plane, 10, Ordering.ENERGY, version=3)
