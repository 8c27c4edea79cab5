"""Cross-implementation parity against the reference's golden artifacts.

These tests use no Rust: the reference's seeded fixture sequences are
regenerated bit-exactly by :mod:`spread_spectrum_watermarking_tpu.utils.
rng_compat` (ChaCha8 + rand_distr ziggurat), and the reference's own golden
watermarked image (tests/watermarked_with_1.png, embedded with the seed-1
mark by the Rust crate) is decoded and detected by OUR pipeline.

Known, quantified fixture caveat: the Rust ``jpeg-decoder`` crate and libjpeg
(PIL/OpenCV agree byte-exactly with each other) decode the base JPEG slightly
differently. The coefficient ranking is pairing-by-rank and hyper-sensitive
to such perturbations: measured effect is a *local* rank permutation (mean
displacement ~9 ranks) while >99% of modulated coefficient values are still
recovered within 0.05. Hence the cross-decoder similarity lands ~17.6 sigma
instead of the reference's in-decoder 31.24 sigma. The coefficient-level
match fraction asserted below is the decoder-independent statement of
numeric parity.
"""

import struct

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import spread_spectrum_watermarking_tpu as wm
from spread_spectrum_watermarking_tpu.utils import rng_compat


def test_chacha20_matches_authoritative_keystream():
    # Zero key/nonce/counter keystream must match the `cryptography` library
    # (same core regardless of counter/nonce layout when all-zero).
    blk = rng_compat._chacha_block([0] * 8, 0, [0, 0], 20)
    got = b"".join(struct.pack("<I", w) for w in blk)
    want_head = bytes.fromhex("76b8e0ada0f13d90405d6ae55386bd28")
    assert got[:16] == want_head


def test_chacha8_u64_stream_is_deterministic():
    a = rng_compat.ChaChaRng.seed_from_u64(1)
    b = rng_compat.ChaChaRng.seed_from_u64(1)
    assert [a.next_u64() for _ in range(100)] == [b.next_u64() for _ in range(100)]
    c = rng_compat.ChaChaRng.seed_from_u64(2)
    assert a.next_u64() != c.next_u64()


def test_seed_expansion_known_shape():
    s = rng_compat.seed_from_u64(1)
    assert len(s) == 32 and s != bytes(32)
    assert rng_compat.seed_from_u64(1) == s


def test_ziggurat_tables_shape_and_monotonicity():
    x, f = rng_compat.ZIG_NORM_X, rng_compat.ZIG_NORM_F
    assert len(x) == 257 and len(f) == 257
    assert x[1] == pytest.approx(rng_compat.ZIG_NORM_R)
    assert all(x[i] > x[i + 1] for i in range(256))
    assert x[256] == 0.0 and f[256] == 1.0
    assert f[0] == pytest.approx(np.exp(-x[0] ** 2 / 2), rel=1e-12)


def test_sequence_statistics():
    seq = rng_compat.generate_fixed_normal_sequence(1, 10000)
    assert seq.dtype == np.float32
    assert abs(seq.mean()) < 0.05
    assert abs(seq.std() - 1.0) < 0.05
    # Deterministic across calls.
    np.testing.assert_array_equal(
        seq[:100], rng_compat.generate_fixed_normal_sequence(1, 100))


def test_golden_image_cross_detection(cat_image, golden_image):
    """Detect the Rust-embedded seed-1 mark with our pipeline.

    The golden PNG was produced by the reference crate
    (tests/single_simple.rs:29-32); a wrong RNG port or any numerics mismatch
    in YIQ/DCT/ordering/extraction would drop this to ~0 sigma.
    """
    mark = rng_compat.generate_fixed_normal_sequence(1, 1000)
    ext = np.asarray(wm.extract(jnp.asarray(cat_image), jnp.asarray(golden_image), 1000))
    sim = np.asarray(wm.similarity(jnp.asarray(ext), jnp.asarray(mark[None])))[0]
    assert sim > 15.0, sim  # observed 17.64; limited only by the jpeg-decoder skew
    null = rng_compat.generate_fixed_normal_sequence(0xBAAAAAAD, 1000)
    nsim = np.asarray(wm.similarity(jnp.asarray(ext), jnp.asarray(null[None])))[0]
    assert abs(nsim) < 3.0, nsim


def test_golden_image_coefficient_level_parity(cat_image, golden_image):
    """Decoder-independent numeric parity: nearly every extracted value must
    equal SOME seed-1 mark value to within 0.05 (rank pairing may be locally
    permuted by the base-JPEG decoder difference; values may not)."""
    mark = rng_compat.generate_fixed_normal_sequence(1, 1000)
    ext = np.asarray(wm.extract(jnp.asarray(cat_image), jnp.asarray(golden_image), 1000))
    matched = 0
    for i in range(1000):
        lo, hi = max(0, i - 40), min(1000, i + 41)
        if np.abs(ext[i] - mark[lo:hi]).min() < 0.05:
            matched += 1
    assert matched / 1000 > 0.95, matched


def test_seed1_self_embedding_matches_reference_bounds(cat_image):
    """Run the reference's single_simple test end-to-end with OUR pipeline
    and the TRUE seed-1 mark: per-coefficient error and self-similarity must
    meet the reference's own asserted bounds (tests/single_simple.rs:59-79)."""
    mark = rng_compat.generate_fixed_normal_sequence(1, 1000)
    marked = np.asarray(wm.embed(jnp.asarray(cat_image), jnp.asarray(mark)))
    ext = np.asarray(wm.extract(jnp.asarray(cat_image), jnp.asarray(marked), 1000))
    err = np.abs(ext - mark)
    # Reference asserts max < 0.12 on ITS decoder's pixels; on libjpeg's
    # pixels the float64 reference-algorithm oracle itself measures 0.1485
    # (tests/test_oracle_parity.py), so 0.12 is unattainable here by any
    # correct implementation. We assert the oracle's value + margin, and
    # test_oracle_parity pins ours to <= the oracle's.
    assert err.max() < 0.155, err.max()
    assert err.mean() < 0.02, err.mean()  # reference bound, met exactly
    sim = np.asarray(wm.similarity(jnp.asarray(ext), jnp.asarray(mark[None])))[0]
    assert sim > 31.2, sim  # reference: 31.24
    null = rng_compat.generate_fixed_normal_sequence(0xBAAAAAAD, 1000)
    nsim = np.asarray(wm.similarity(jnp.asarray(ext), jnp.asarray(null[None])))[0]
    assert abs(nsim) < 2.0, nsim  # reference: < 2 sigma (single_simple.rs:84-90)
