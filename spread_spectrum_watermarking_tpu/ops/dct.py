"""Full-frame 2-D DCT-II / inverse DCT-III in matmul form (MXU-native).

The reference performs the 2-D DCT as sequential 1-D FFT-based passes over
every row then every column (reference: src/dct2d.rs:83-219, "a pretty
non-optimised implementation that does all rows and columns in sequence",
src/dct2d.rs:6-7). On TPU the right formulation is dense cosine-basis
matmuls: ``C_h @ X @ C_w^T`` keeps the systolic array busy, batches freely
over images, and lets XLA fuse the surrounding elementwise work. Basis
matrices up to 4K (4096^2 f32 = 64 MB in HBM) are cheap and cached per size.

Scaling contract (must match scipy.fftpack, reference src/dct2d.rs:105-118):

- ``DCT2`` (forward): scipy's non-ortho type-II, i.e.
  ``y_k = 2 * sum_n x_n cos(pi k (2n+1) / (2N))`` per 1-D pass.
- ``DCT2 orthogonal``: scipy's ``norm='ortho'`` -- k=0 scaled by
  sqrt(1/(4N)), k>0 by sqrt(1/(2N)) (reference: src/dct2d.rs:153-162).
- ``DCT3`` (inverse): rustdct's wiki-style DCT-III halved per pass plus a
  final global ``4/(W*H)`` correction (reference: src/dct2d.rs:109,213-218),
  so that ``idct2(dct2(x)) == x``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Precision, jax_precision


@functools.lru_cache(maxsize=64)
def dct2_basis(n: int, ortho: bool = False) -> np.ndarray:
    """Forward DCT-II basis C with C[k, m] = 2 cos(pi k (2m+1) / (2N)).

    Applying ``x @ C.T`` transforms the last axis exactly like one scipy
    ``dct(x, type=2)`` pass (the reference's per-row/col operation at
    src/dct2d.rs:141,166: rustdct output times 2).

    With ``ortho=True`` rows are rescaled to scipy's ``norm='ortho'``:
    row 0 by sqrt(1/(4N)), rows k>0 by sqrt(1/(2N))
    (reference: src/dct2d.rs:153-162).
    """
    k = np.arange(n, dtype=np.float64)[:, None]
    m = np.arange(n, dtype=np.float64)[None, :]
    c = 2.0 * np.cos(np.pi * k * (2.0 * m + 1.0) / (2.0 * n))
    if ortho:
        s = np.full((n, 1), np.sqrt(1.0 / (2.0 * n)))
        s[0, 0] = np.sqrt(1.0 / (4.0 * n))
        c = c * s
    return c.astype(np.float32)


@functools.lru_cache(maxsize=64)
def dct3_basis(n: int) -> np.ndarray:
    """Inverse (DCT-III) basis D with the reference's per-pass 0.5 scaling.

    rustdct's DCT-III is ``y_k = x_0/2 + sum_{m>=1} x_m cos(pi m (2k+1)/(2N))``
    and the reference halves every output (src/dct2d.rs:109). So
    ``D[k, 0] = 0.25`` and ``D[k, m] = 0.5 cos(pi m (2k+1) / (2N))`` for m>=1.
    The global ``4/(W*H)`` factor (src/dct2d.rs:213-218) is applied by
    :func:`idct2_2d`, not folded here, to mirror the reference's scaling
    structure.
    """
    k = np.arange(n, dtype=np.float64)[:, None]
    m = np.arange(n, dtype=np.float64)[None, :]
    d = 0.5 * np.cos(np.pi * m * (2.0 * k + 1.0) / (2.0 * n))
    d[:, 0] = 0.25
    return d.astype(np.float32)


def dct2_2d(
    x: jax.Array,
    *,
    ortho: bool = False,
    precision: Precision = Precision.HIGHEST,
) -> jax.Array:
    """2-D DCT-II over the last two axes (..., H, W), scipy scaling.

    Equivalent to the reference's ``dct2_2d(Type::DCT2 | DCT2Orthogonal)``
    (src/dct2d.rs:83-219) but batched: leading axes are vmapped for free by
    the contraction. Row/col pass order is float-irrelevant in matmul form
    (the reference orders larger-dim-first only for scratch reuse,
    src/dct2d.rs:93-98).
    """
    h, w = x.shape[-2], x.shape[-1]
    ch = jnp.asarray(dct2_basis(h, ortho))
    cw = jnp.asarray(dct2_basis(w, ortho))
    p = jax_precision(precision)
    # Column pass: C_h @ X ; row pass: (.) @ C_w^T.
    t = jnp.einsum("km,...mw->...kw", ch, x, precision=p)
    return jnp.einsum("...kw,lw->...kl", t, cw, precision=p)


def idct2_2d(
    x: jax.Array,
    *,
    precision: Precision = Precision.HIGHEST,
) -> jax.Array:
    """Inverse of :func:`dct2_2d` (non-ortho): DCT-III passes + 4/(W*H).

    Matches the reference's ``dct2_2d(Type::DCT3)`` net scaling
    (src/dct2d.rs:109,213-218): per-pass 0.5 is folded into the basis, the
    global ``4/(W*H)`` is applied at the end.
    """
    h, w = x.shape[-2], x.shape[-1]
    dh = jnp.asarray(dct3_basis(h))
    dw = jnp.asarray(dct3_basis(w))
    p = jax_precision(precision)
    t = jnp.einsum("km,...mw->...kw", dh, x, precision=p)
    y = jnp.einsum("...kw,lw->...kl", t, dw, precision=p)
    return y * (4.0 / (w * h))
