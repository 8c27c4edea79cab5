"""DCT numerics tests against the scipy.fftpack oracle.

The reference's golden-value tests were generated from scipy snippets kept in
its comments (reference: src/dct2d.rs:221-525); scipy is available here, so
we test against the oracle directly, on the same shapes the reference pins
(3x3, 5x4, 4x3) plus larger/batched cases. Tolerance mirrors the reference's
1e-4 absolute bar (src/dct2d.rs:251,289,318).
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.fftpack

from spread_spectrum_watermarking_tpu.config import Precision
from spread_spectrum_watermarking_tpu.ops import dct


def scipy_dct2_2d(x, norm=None):
    # The reference's definition of a 2-D DCT: one scipy pass per axis
    # (src/dct2d.rs:17-32 quotes the 2013 Python reference implementation).
    return scipy.fftpack.dct(
        scipy.fftpack.dct(x, type=2, axis=-1, norm=norm), type=2, axis=-2, norm=norm)


def scipy_idct2_2d(x):
    # Inverse of the non-ortho forward: scipy idct type 2 with its scaling.
    y = scipy.fftpack.idct(
        scipy.fftpack.idct(x, type=2, axis=-1), type=2, axis=-2)
    h, w = x.shape[-2], x.shape[-1]
    return y / (4.0 * h * w)


@pytest.mark.parametrize("shape", [(3, 3), (5, 4), (4, 3), (8, 8), (37, 59)])
def test_dct2_matches_scipy(shape):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(dct.dct2_2d(jnp.asarray(x)))
    want = scipy_dct2_2d(x.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1.0, np.abs(want).max()))


@pytest.mark.parametrize("shape", [(3, 3), (5, 4), (4, 3)])
def test_dct2_ortho_matches_scipy(shape):
    rng = np.random.default_rng(1)
    x = rng.standard_normal(shape).astype(np.float32)
    got = np.asarray(dct.dct2_2d(jnp.asarray(x), ortho=True))
    want = scipy_dct2_2d(x.astype(np.float64), norm="ortho")
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_simple_1d_golden():
    # The reference's first golden: dct([1,0,0]) == [2, 1.73205081, 1]
    # (src/dct2d.rs:229-245, scipy type-2 scaling).
    x = jnp.asarray([[1.0, 0.0, 0.0]], dtype=jnp.float32)
    got = np.asarray(dct.dct2_2d(x))[0]
    # A (1,3) image: the column pass over a length-1 axis multiplies by 2.
    np.testing.assert_allclose(got, [2 * 2.0, 2 * 1.73205081, 2 * 1.0], atol=1e-4)


@pytest.mark.parametrize("shape", [(3, 3), (5, 4), (6, 4), (64, 48)])
def test_roundtrip_identity(shape):
    rng = np.random.default_rng(2)
    x = rng.standard_normal(shape).astype(np.float32)
    back = np.asarray(dct.idct2_2d(dct.dct2_2d(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_idct_matches_scipy():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 4)).astype(np.float32)
    got = np.asarray(dct.idct2_2d(jnp.asarray(x)))
    want = scipy_idct2_2d(x.astype(np.float64))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_batched_matches_loop():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((3, 6, 5)).astype(np.float32)
    batched = np.asarray(dct.dct2_2d(jnp.asarray(x)))
    for i in range(3):
        single = np.asarray(dct.dct2_2d(jnp.asarray(x[i])))
        np.testing.assert_allclose(batched[i], single, atol=1e-5)


def test_precision_modes_close():
    # HIGH (bf16x3) must stay close to HIGHEST on realistic image data.
    rng = np.random.default_rng(5)
    x = rng.random((64, 48), dtype=np.float32)
    hi = np.asarray(dct.dct2_2d(jnp.asarray(x), precision=Precision.HIGHEST))
    mid = np.asarray(dct.dct2_2d(jnp.asarray(x), precision=Precision.HIGH))
    scale = np.abs(hi).max()
    assert np.abs(hi - mid).max() / scale < 1e-5


@pytest.mark.parametrize("shape", [(5, 4), (4, 5), (8, 8), (48, 64), (64, 48)])
def test_coeffs_at_matches_full(shape):
    # Sparse coefficient evaluation (the read path's derived transform) must
    # equal gathering the full transform, for H<W, H>W, and H==W.
    rng = np.random.default_rng(12)
    x = rng.standard_normal(shape).astype(np.float32)
    n = min(10, shape[0] * shape[1])
    idx = rng.choice(shape[0] * shape[1], size=n, replace=False).astype(np.int32)
    full = np.asarray(dct.dct2_2d(jnp.asarray(x))).reshape(-1)[idx]
    sparse = np.asarray(dct.dct2_coeffs_at(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_allclose(sparse, full, atol=np.abs(full).max() * 1e-5 + 1e-5)


def test_coeffs_at_batched():
    rng = np.random.default_rng(13)
    x = rng.standard_normal((3, 6, 10)).astype(np.float32)
    idx = np.stack([rng.choice(60, size=7, replace=False) for _ in range(3)]
                   ).astype(np.int32)
    full = np.asarray(dct.dct2_2d(jnp.asarray(x))).reshape(3, -1)
    want = np.take_along_axis(full, idx, axis=-1)
    got = np.asarray(dct.dct2_coeffs_at(jnp.asarray(x), jnp.asarray(idx)))
    np.testing.assert_allclose(got, want, atol=np.abs(want).max() * 1e-5 + 1e-5)


def test_folded_matches_dense():
    # The fold option (basis-symmetry FLOP halving) must agree with the dense
    # matmul form to f32 reassociation tolerance, forward and inverse.
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 64, 128)).astype(np.float32))
    a = np.asarray(dct.dct2_2d(x, fold=True))
    b = np.asarray(dct.dct2_2d(x, fold=False))
    np.testing.assert_allclose(a, b, rtol=0, atol=np.abs(b).max() * 1e-5)
    ia = np.asarray(dct.idct2_2d(jnp.asarray(a), fold=True))
    np.testing.assert_allclose(ia, np.asarray(x), rtol=0, atol=1e-4)


def test_dct2_dot_at_broadcasts_shared_indices():
    # Shared (n,) indices across a batched intermediate must work at every
    # tier (the gather form's broadcast semantics; the fast tiers used to
    # raise -- ADVICE r3 item 4).
    rng = np.random.default_rng(7)
    y = rng.normal(size=(3, 16, 24)).astype(np.float32)
    idx = np.array([1, 5, 100, 383], dtype=np.int32)
    exact = np.asarray(dct.dct2_2d(
        jnp.asarray(y), precision=Precision.HIGHEST)).reshape(3, -1)[:, idx]
    t = dct.dct2_pass(jnp.asarray(y), axis=-2, precision=Precision.HIGHEST)
    for prec, rtol, atol in ((Precision.HIGHEST, 1e-5, 1e-5),
                             (Precision.HIGH, 1e-4, 1e-3),
                             # bf16 dot: absolute error scales with the sum
                             # of |products|, not the (possibly cancelled)
                             # output magnitude.
                             (Precision.DEFAULT, 3e-2, 0.2)):
        got = np.asarray(dct.dct2_dot_at(t, jnp.asarray(idx),
                                         contracted_axis=-2, precision=prec))
        assert got.shape == (3, 4)
        np.testing.assert_allclose(got, exact, rtol=rtol, atol=atol)


def test_dct2_dot_at_selection_reduction_is_exact():
    # The one-hot selection after the fast-tier matmul must NOT round the
    # f32 dot output to bf16 (ADVICE r3 item 2: an unqualified einsum lowered
    # to a DEFAULT-precision dot and truncated the accumulation). At HIGH the
    # whole gather-free form must therefore track the HIGHEST gather+dot form
    # to f32-reassociation grade, not bf16 grade.
    rng = np.random.default_rng(13)
    y = rng.normal(size=(2, 64, 96)).astype(np.float32) * 10
    idx = np.asarray(rng.integers(1, 64 * 96, size=(2, 200)), dtype=np.int32)
    t = dct.dct2_pass(jnp.asarray(y), axis=-2, precision=Precision.HIGHEST)
    exact = np.asarray(dct.dct2_dot_at(t, jnp.asarray(idx),
                                       contracted_axis=-2,
                                       precision=Precision.HIGHEST))
    high = np.asarray(dct.dct2_dot_at(t, jnp.asarray(idx),
                                      contracted_axis=-2,
                                      precision=Precision.HIGH))
    err = np.abs(high - exact) / np.maximum(np.abs(exact), 1e-3)
    assert err.max() < 2e-3, err.max()
