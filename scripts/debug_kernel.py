#!/usr/bin/env python
"""Locate the Pallas prologue kernel's divergence from the XLA half-pass."""

import sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spread_spectrum_watermarking_tpu.config import Precision
from spread_spectrum_watermarking_tpu.ops import colorspace, dct, fused_dct

rng = np.random.default_rng(0)


def check(h, w, b=2, prec=Precision.DEFAULT):
    images = jnp.asarray(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))
    ax = -2 if h <= w else -1
    t_xla = jax.jit(lambda i: dct.dct2_pass(
        colorspace.rgb_to_luma(colorspace.u8_to_f32(i)).astype(jnp.bfloat16),
        axis=ax, precision=Precision.DEFAULT, out_dtype=jnp.bfloat16))(images)
    t_k = jax.jit(lambda i: fused_dct.luma_pass(
        i, prec, out_dtype=jnp.bfloat16, interpret=False))(images)
    # f64 oracle
    yf = np.asarray(images, dtype=np.float64)
    y = (0.30 * yf[..., 0] + 0.59 * yf[..., 1] + 0.11 * yf[..., 2]) / 255.0
    basis = np.asarray(dct.dct2_basis(h if h <= w else w), dtype=np.float64)
    if h <= w:
        oracle = np.einsum("km,bmw->bkw", basis, y)
    else:
        oracle = np.einsum("km,bhm->bhk", basis, y)
    a_x = np.asarray(t_xla, dtype=np.float64)
    a_k = np.asarray(t_k, dtype=np.float64)
    scale = np.abs(oracle) + 1.0
    ex = np.abs(a_x - oracle) / scale
    ek = np.abs(a_k - oracle) / scale
    i = np.unravel_index(np.argmax(ek), ek.shape)
    print(f"{h}x{w} {prec.value}: XLA maxrel {ex.max():.4f}  "
          f"kernel maxrel {ek.max():.4f} at {i} "
          f"(oracle {oracle[i]:.4f} kernel {a_k[i]:.4f} xla {a_x[i]:.4f})",
          flush=True)


check(1080, 1920)
check(2160, 3840)
check(2160, 3840, prec=Precision.HIGH)
check(1080, 1920, prec=Precision.HIGH)
