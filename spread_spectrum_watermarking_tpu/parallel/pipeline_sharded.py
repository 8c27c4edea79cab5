"""Sharded end-to-end pipelines: DP over image batches, TP over one huge image.

Two scaling modes (SURVEY.md section 2.1):

- :func:`embed_batch_sharded` / :func:`extract_batch_sharded`: data-parallel
  -- shard the batch axis over the mesh's ``data`` axis. The per-image
  program is untouched; XLA partitions the batched einsums and top-k.

- :func:`embed_spatial` / :func:`extract_spatial`: tensor/spatial-parallel
  for a single image too large for one chip -- the sharded DCT's all-to-all
  (dct_sharded.py) plus the distributed top-k (topk_sharded.py), with
  modulation running replicated on the gathered top-n values and scattered
  back into the column-sharded coefficient layout.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import ReadConfig, WriteConfig
from ..models import pipeline
from ..ops import colorspace, modulation
from .dct_sharded import (_pad_last2, dct2_2d_sharded_padded,
                          idct2_2d_sharded_padded, padded_size)
from .mesh import DATA_AXIS, SPATIAL_AXIS
from .topk_sharded import distributed_top_indices


# ---------------------------------------------------------------------------
# Data-parallel batch pipelines
# ---------------------------------------------------------------------------


def embed_batch_sharded(rgb, marks, mesh: Mesh,
                        config: WriteConfig = WriteConfig(), quantize=True):
    """DP embed: (B, H, W, 3) images sharded over the data axis."""
    bs = NamedSharding(mesh, P(DATA_AXIS))
    rgb = jax.device_put(rgb, NamedSharding(mesh, P(DATA_AXIS, None, None, None)))
    marks = jax.device_put(marks, bs)
    return pipeline.embed(rgb, marks, config, quantize=quantize)


def extract_batch_sharded(base, derived, n: int, mesh: Mesh,
                          config: ReadConfig = ReadConfig()):
    """DP extract: both image batches sharded over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS, None, None, None))
    base = jax.device_put(base, sh)
    derived = jax.device_put(derived, sh)
    return pipeline.extract(base, derived, n, config)


# ---------------------------------------------------------------------------
# Spatial (tensor-parallel) single-image pipelines
# ---------------------------------------------------------------------------


def _modulate_sharded(coeffs, marks, mesh: Mesh, config: WriteConfig,
                      height: int, width: int):
    """Top-k + modulation + scatter on P(None, spatial) coefficients."""

    def local(coef_blk, marks_rep):
        h, wb = coef_blk.shape
        my_id = jax.lax.axis_index(SPATIAL_AXIS)
        n = marks_rep.shape[-1]

        idx = distributed_top_indices(coef_blk, n, config.ordering,
                                      height, width)  # replicated (n,)
        rows = idx // width
        cols = idx % width
        owner = cols // wb
        local_flat = rows * wb + (cols - my_id * wb)

        flat_blk = coef_blk.reshape(-1)
        mine = owner == my_id
        # Gather owned values, zero elsewhere, then psum -> replicated values.
        safe_gather = jnp.where(mine, local_flat, 0)
        vals = jnp.where(mine, flat_blk[safe_gather], 0.0)
        original = jax.lax.psum(vals, SPATIAL_AXIS)  # replicated (n,)

        new_values = modulation.embed_marks(
            original, marks_rep, config.insertion.method,
            config.insertion.alpha, custom_insert=config.custom_insert,
            indices=idx)

        # Scatter owned updates; non-owned positions aimed out of bounds.
        oob = jnp.asarray(flat_blk.shape[0], dtype=local_flat.dtype)
        scatter_idx = jnp.where(mine, local_flat, oob)
        flat_blk = flat_blk.at[scatter_idx].set(new_values, mode="drop")
        return flat_blk.reshape(h, wb)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, SPATIAL_AXIS), P(None)),
        out_specs=P(None, SPATIAL_AXIS),
    )(coeffs, marks)


@functools.partial(jax.jit, static_argnames=("mesh", "config", "quantize", "h"))
def _embed_spatial_jit(rgb, marks, mesh, config, quantize, h):
    # ``rgb`` arrives with its rows already zero-padded to divisibility and
    # row-sharded (see _place_row_sharded); ``h`` is the true height.
    w = rgb.shape[1]
    n = mesh.shape[SPATIAL_AXIS]
    wp = padded_size(w, n)
    hp = rgb.shape[0]
    yiq = colorspace.rgb_to_yiq(pipeline._to_f32(rgb))
    # Arbitrary sizes (the reference handles any W x H, src/dct2d.rs:83-98):
    # pad the luma plane up to divisibility; the zero-extended bases keep the
    # padding inert, the top-k masks it out, and the result is cropped.
    y_pad = _pad_last2(yiq[..., 0], hp, wp)
    coeffs = dct2_2d_sharded_padded(y_pad, mesh, h, w,
                                    precision=config.precision)
    coeffs = _modulate_sharded(coeffs, marks, mesh, config, h, w)
    y = idct2_2d_sharded_padded(coeffs, mesh, h, w,
                                precision=config.precision)[..., :h, :w]
    out = colorspace.yiq_to_rgb(
        jnp.concatenate([y[..., None], yiq[..., :h, :, 1:]], axis=-1))
    if quantize:
        out = colorspace.f32_to_u8(out)
    return out


def _place_row_sharded(img, mesh: Mesh):
    """Zero-pad rows to spatial-axis divisibility and place P(spatial, ...).

    Padding happens on the host BEFORE device_put so the image is always
    genuinely row-sharded -- a replicated fallback would reinstate the
    per-device memory ceiling for exactly the images this path exists for
    (single images too large for one chip).
    """
    import numpy as np

    nsp = mesh.shape[SPATIAL_AXIS]
    hp = padded_size(img.shape[0], nsp)
    if hp != img.shape[0]:
        img = np.asarray(img)
        img = np.pad(img, ((0, hp - img.shape[0]),) + ((0, 0),) * (img.ndim - 1))
    return jax.device_put(
        img, NamedSharding(mesh, P(*((SPATIAL_AXIS,) + (None,) * (img.ndim - 1)))))


def embed_spatial(rgb, marks, mesh: Mesh,
                  config: WriteConfig = WriteConfig(), quantize=True):
    """TP embed of ONE (H, W, 3) image sharded spatially over the mesh.

    Any H x W is accepted (non-divisible sizes are zero-padded on the host,
    mirroring the reference's arbitrary-size support, src/dct2d.rs:83-98, and
    then row-sharded so no device ever holds the full image). Returns the
    (H, W, 3) result.
    """
    if marks.ndim == 1:
        marks = marks[None]
    h = rgb.shape[0]
    rgb = _place_row_sharded(rgb, mesh)
    marks = jax.device_put(marks, NamedSharding(mesh, P()))
    return _embed_spatial_jit(rgb, marks, mesh, config, quantize, h)


@functools.partial(jax.jit, static_argnames=("mesh", "config", "n", "h"))
def _extract_spatial_jit(base, derived, n, mesh, config, h):
    # Inputs arrive row-padded to divisibility and row-sharded; ``h`` is the
    # true height (see _place_row_sharded).
    w = base.shape[1]
    nspatial = mesh.shape[SPATIAL_AXIS]
    hp, wp = base.shape[0], padded_size(w, nspatial)
    yb = _pad_last2(colorspace.rgb_to_yiq(pipeline._to_f32(base))[..., 0], hp, wp)
    yd = _pad_last2(colorspace.rgb_to_yiq(pipeline._to_f32(derived))[..., 0], hp, wp)
    cb = dct2_2d_sharded_padded(yb, mesh, h, w, precision=config.precision)
    cd = dct2_2d_sharded_padded(yd, mesh, h, w, precision=config.precision)

    def local(cb_blk, cd_blk):
        wb = cb_blk.shape[1]
        my_id = jax.lax.axis_index(SPATIAL_AXIS)
        idx = distributed_top_indices(cb_blk, n, config.ordering, h, w)
        rows, cols = idx // w, idx % w
        owner = cols // wb
        local_flat = rows * wb + (cols - my_id * wb)
        mine = owner == my_id
        safe = jnp.where(mine, local_flat, 0)
        bvals = jax.lax.psum(
            jnp.where(mine, cb_blk.reshape(-1)[safe], 0.0), SPATIAL_AXIS)
        dvals = jax.lax.psum(
            jnp.where(mine, cd_blk.reshape(-1)[safe], 0.0), SPATIAL_AXIS)
        if config.custom_extract is not None:
            return config.custom_extract(idx, bvals, dvals)
        return modulation.extract_values(
            config.extraction.method, config.extraction.alpha, bvals, dvals)

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(None, SPATIAL_AXIS), P(None, SPATIAL_AXIS)),
        out_specs=P(None),
    )(cb, cd)


def extract_spatial(base, derived, n: int, mesh: Mesh,
                    config: ReadConfig = ReadConfig()):
    """TP extract from ONE huge image pair sharded spatially over the mesh."""
    if base.shape != derived.shape:
        raise ValueError(
            "Derived coefficient length not equal to base coefficient length.")
    if n >= base.shape[0] * base.shape[1]:
        raise ValueError("Desired extraction length exceeds available coefficients.")
    h = base.shape[0]
    base = _place_row_sharded(base, mesh)
    derived = _place_row_sharded(derived, mesh)
    return _extract_spatial_jit(base, derived, n, mesh, config, h)
