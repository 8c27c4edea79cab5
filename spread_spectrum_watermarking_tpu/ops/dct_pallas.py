"""Pallas fused 2-D DCT kernels.

The matmul-form DCT (ops/dct.py) is two XLA einsums with the row-pass
intermediate ``T = C_h @ X`` materialized in HBM. For images whose working
set fits VMEM (X, T, both bases: roughly H*W*8 + 4*(H^2+W^2) bytes under the
~16 MB/core budget -- e.g. the 640x444 reference image, 512x512 tiles), this
kernel fuses both passes: one grid step per image computes
``C_h @ X @ C_w^T`` entirely on-chip, eliminating the intermediate's HBM
round trip and the second kernel launch.

Numerics: identical bases and scaling as ops/dct.py (scipy contract,
reference src/dct2d.rs:105-118); the MXU dots accumulate in f32.

Use :func:`fits_vmem` to decide, or call :func:`dct2_2d_auto` /
:func:`idct2_2d_auto` which dispatch between this kernel and the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Precision
from . import dct as dct_ops

# Leave headroom under the ~16 MB/core VMEM budget for double buffering and
# compiler temporaries.
_VMEM_BUDGET_BYTES = 10 * 1024 * 1024


def fits_vmem(h: int, w: int) -> bool:
    need = 4 * (2 * h * w + h * h + w * w)
    return need <= _VMEM_BUDGET_BYTES


def _fused_kernel(x_ref, a_ref, bt_ref, out_ref):
    # x: (1, H, W); a: (H, H) left basis; bt: (W, W) right basis transposed.
    t = jnp.dot(a_ref[:], x_ref[0], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.dot(t, bt_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("ortho",))
def dct2_2d_fused(x: jax.Array, *, ortho: bool = False) -> jax.Array:
    """Fused forward DCT-II over (..., H, W); one grid step per image."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    xb = x.reshape((-1, h, w)).astype(jnp.float32)
    b = xb.shape[0]
    a = jnp.asarray(dct_ops.dct2_basis(h, ortho))
    bt = jnp.asarray(dct_ops.dct2_basis(w, ortho)).T

    out = pl.pallas_call(
        _fused_kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h * h * w + h * w * w),
            bytes_accessed=4 * b * 2 * h * w + 4 * (h * h + w * w),
            transcendentals=0,
        ),
    )(xb, a, bt)
    return out.reshape(*batch_shape, h, w)


@jax.jit
def idct2_2d_fused(x: jax.Array) -> jax.Array:
    """Fused inverse DCT (DCT-III passes + 4/(W*H)); see ops/dct.idct2_2d."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    batch_shape = x.shape[:-2]
    h, w = x.shape[-2], x.shape[-1]
    xb = x.reshape((-1, h, w)).astype(jnp.float32)
    b = xb.shape[0]
    a = jnp.asarray(dct_ops.dct3_basis(h))
    bt = jnp.asarray(dct_ops.dct3_basis(w)).T

    def kernel(x_ref, a_ref, bt_ref, out_ref):
        t = jnp.dot(a_ref[:], x_ref[0], preferred_element_type=jnp.float32)
        out_ref[0] = jnp.dot(t, bt_ref[:],
                             preferred_element_type=jnp.float32) * (4.0 / (w * h))

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, w), jnp.float32),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, w), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * (h * h * w + h * w * w),
            bytes_accessed=4 * b * 2 * h * w + 4 * (h * h + w * w),
            transcendentals=0,
        ),
    )(xb, a, bt)
    return out.reshape(*batch_shape, h, w)


def dct2_2d_auto(x: jax.Array, *, ortho: bool = False,
                 precision: Precision = Precision.HIGHEST) -> jax.Array:
    """Dispatch: fused Pallas kernel when the image fits VMEM, else XLA."""
    h, w = x.shape[-2], x.shape[-1]
    if jax.default_backend() == "tpu" and fits_vmem(h, w):
        return dct2_2d_fused(x, ortho=ortho)
    return dct_ops.dct2_2d(x, ortho=ortho, precision=precision)


def idct2_2d_auto(x: jax.Array, *,
                  precision: Precision = Precision.HIGHEST) -> jax.Array:
    h, w = x.shape[-2], x.shape[-1]
    if jax.default_backend() == "tpu" and fits_vmem(h, w):
        return idct2_2d_fused(x)
    return dct_ops.idct2_2d(x, precision=precision)
