"""Spatially-sharded 2-D DCT for images too large for one chip.

The separable 2-D DCT over a row-sharded image needs a reshard between the
row pass and the column pass: each device transforms its rows locally, then
an all-to-all (the image-domain analog of Ulysses-style sequence-parallel
attention) re-tiles the array column-sharded so the column pass is also
local. This is the component the reference's sequential double loop
(reference: src/dct2d.rs:128-207) becomes when a 4K+ image is spread over a
slice (SURVEY.md sections 2.1, 5 "long-context analog").

Data layout: input (H, W) sharded P(spatial, None); output (H, W) sharded
P(None, spatial). The inverse takes the column-sharded layout back to
row-sharded, so a full embed round trip ends in the input layout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import Precision, jax_precision
from ..ops.dct import dct2_basis, dct3_basis
from .mesh import SPATIAL_AXIS


def dct2_2d_sharded(
    y: jax.Array,
    mesh: Mesh,
    *,
    ortho: bool = False,
    precision: Precision = Precision.HIGHEST,
) -> jax.Array:
    """Forward sharded DCT-II: in P(spatial, None) -> out P(None, spatial).

    Scaling identical to :func:`..ops.dct.dct2_2d` (scipy non-ortho or ortho).
    """
    h, w = y.shape[-2], y.shape[-1]
    n = mesh.shape[SPATIAL_AXIS]
    if h % n or w % n:
        raise ValueError(f"image {h}x{w} not divisible by spatial axis {n}")
    ch = jnp.asarray(dct2_basis(h, ortho))
    cw = jnp.asarray(dct2_basis(w, ortho))
    p = jax_precision(precision)

    def local(y_blk, ch_full, cw_full):
        # Row pass on the local row block: (H/n, W) @ (W, W)^T.
        t = jnp.einsum("...hw,lw->...hl", y_blk, cw_full, precision=p)
        # Reshard rows->columns over ICI: (H/n, W) -> (H, W/n).
        t = jax.lax.all_to_all(t, SPATIAL_AXIS, split_axis=t.ndim - 1,
                               concat_axis=t.ndim - 2, tiled=True)
        # Column pass, local on the column block: (H, H) @ (H, W/n).
        return jnp.einsum("km,...mw->...kw", ch_full, t, precision=p)

    spec_in = P(*([None] * (y.ndim - 2)), SPATIAL_AXIS, None)
    spec_out = P(*([None] * (y.ndim - 2)), None, SPATIAL_AXIS)
    return shard_map(
        functools.partial(local),
        mesh=mesh,
        in_specs=(spec_in, P(None, None), P(None, None)),
        out_specs=spec_out,
    )(y, ch, cw)


def idct2_2d_sharded(
    x: jax.Array,
    mesh: Mesh,
    *,
    precision: Precision = Precision.HIGHEST,
) -> jax.Array:
    """Inverse sharded DCT: in P(None, spatial) -> out P(spatial, None)."""
    h, w = x.shape[-2], x.shape[-1]
    n = mesh.shape[SPATIAL_AXIS]
    if h % n or w % n:
        raise ValueError(f"image {h}x{w} not divisible by spatial axis {n}")
    dh = jnp.asarray(dct3_basis(h))
    dw = jnp.asarray(dct3_basis(w))
    p = jax_precision(precision)
    scale = 4.0 / (w * h)

    def local(x_blk, dh_full, dw_full):
        # Column pass on the local column block: (H, H) @ (H, W/n).
        t = jnp.einsum("km,...mw->...kw", dh_full, x_blk, precision=p)
        # Reshard columns->rows: (H, W/n) -> (H/n, W).
        t = jax.lax.all_to_all(t, SPATIAL_AXIS, split_axis=t.ndim - 2,
                               concat_axis=t.ndim - 1, tiled=True)
        # Row pass local: (H/n, W) @ (W, W)^T, then the global correction.
        return jnp.einsum("...hw,lw->...hl", t, dw_full, precision=p) * scale

    spec_in = P(*([None] * (x.ndim - 2)), None, SPATIAL_AXIS)
    spec_out = P(*([None] * (x.ndim - 2)), SPATIAL_AXIS, None)
    return shard_map(
        local,
        mesh=mesh,
        in_specs=(spec_in, P(None, None), P(None, None)),
        out_specs=spec_out,
    )(x, dh, dw)
