"""Pallas fused DCT kernel tests (interpret mode on CPU; compiled on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from spread_spectrum_watermarking_tpu.ops import dct, dct_pallas


on_tpu = jax.default_backend() == "tpu"


def _fused_fwd(x, ortho=False):
    if on_tpu:
        return dct_pallas.dct2_2d_fused(x, ortho=ortho)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return dct_pallas.dct2_2d_fused(x, ortho=ortho)


def _fused_inv(x):
    if on_tpu:
        return dct_pallas.idct2_2d_fused(x)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        return dct_pallas.idct2_2d_fused(x)


@pytest.mark.parametrize("shape", [(2, 64, 96), (1, 128, 128)])
def test_fused_matches_xla(shape):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(shape).astype(np.float32)
    want = np.asarray(dct.dct2_2d(jnp.asarray(x)))
    got = np.asarray(_fused_fwd(jnp.asarray(x)))
    scale = np.abs(want).max()
    np.testing.assert_allclose(got, want, atol=1e-4 * max(1.0, scale))


def test_fused_ortho_matches_xla():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 32, 48)).astype(np.float32)
    want = np.asarray(dct.dct2_2d(jnp.asarray(x), ortho=True))
    got = np.asarray(_fused_fwd(jnp.asarray(x), ortho=True))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fused_roundtrip():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 64, 64)).astype(np.float32)
    back = np.asarray(_fused_inv(_fused_fwd(jnp.asarray(x))))
    np.testing.assert_allclose(back, x, atol=1e-4)


def test_fits_vmem_policy():
    assert dct_pallas.fits_vmem(444, 640)      # the reference cat image
    assert dct_pallas.fits_vmem(512, 512)
    assert not dct_pallas.fits_vmem(1080, 1920)  # 1080p goes to the XLA path
