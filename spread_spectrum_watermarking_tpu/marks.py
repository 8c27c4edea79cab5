"""Watermark generation and containers.

The reference's ``MarkBuf::generate_normal`` samples from N(0, 1) with
``thread_rng`` (reference: src/algorithm.rs:608-645); the paper recommends
N(0,1) over binary signals (section IV-D, cited at src/algorithm.rs:604-606).
Here generation uses explicit ``jax.random`` keys, so reproducibility is free
instead of impossible.

For bit-compatibility with the reference's *seeded test fixtures*
(ChaCha8Rng + rand_distr's ziggurat StandardNormal, reference:
tests/util.rs:6-13), see :mod:`..utils.rng_compat`, which reproduces that
exact sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def generate_normal(key: jax.Array, length: int, count: int | None = None) -> jax.Array:
    """Sample watermark(s) from N(0, 1).

    Returns shape ``(length,)`` if ``count`` is None, else ``(count, length)``.
    Replaces ``MarkBuf::generate_normal`` (reference: src/algorithm.rs:619-626)
    with an explicit-key, batch-first API.
    """
    shape = (length,) if count is None else (count, length)
    return jax.random.normal(key, shape, dtype=jnp.float32)


def as_marks(values) -> np.ndarray:
    """Coerce any array-like of floats to a (M, N) float32 mark matrix.

    The reference's ``Mark`` trait accepts anything ``AsRef<[f32]>``
    (src/algorithm.rs:659-666); here any array-like works.
    """
    arr = np.asarray(values, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[None]
    if arr.ndim != 2:
        raise ValueError(f"marks must be 1-D or 2-D, got shape {arr.shape}")
    return arr
