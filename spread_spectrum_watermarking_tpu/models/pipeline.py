"""End-to-end jitted watermarking pipelines (the framework's "models").

Each public function is one pure, batched, jittable program over
``(B, H, W, 3)`` image arrays -- the whole reference call stack between
``into_rgb32f`` and ``into_rgb8`` (reference: src/algorithm.rs:295-379 Writer,
:462-562 Reader, call stacks in SURVEY.md section 3) compiled as a single XLA
computation: colorspace -> DCT -> rank -> modulate -> inverse DCT ->
colorspace, with batching and sharding handled by JAX instead of
one-image-at-a-time object state.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..config import Precision, ReadConfig, WriteConfig, jax_precision
from ..ops import colorspace, dct, fused_dct, modulation, ranking


def _to_f32(rgb: jax.Array) -> jax.Array:
    if jnp.issubdtype(rgb.dtype, jnp.integer):
        return colorspace.u8_to_f32(rgb)
    return rgb.astype(jnp.float32)


def _forward(rgb: jax.Array, precision) -> jax.Array:
    """RGB (..., H, W, 3) -> Y-channel DCT coefficients (..., H, W).

    The shared prologue of Writer and Reader (reference:
    src/algorithm.rs:308-313, 476-480). Only the luma plane is ever
    transformed, so I/Q are never computed here.
    """
    return dct.dct2_2d(
        colorspace.rgb_to_luma(_to_f32(rgb)), precision=precision)


def _sparse_idct_delta(
    delta: jax.Array,
    idx: jax.Array,
    h: int,
    w: int,
    precision,
) -> jax.Array:
    """Inverse-DCT of a sparse coefficient update, as a skinny matmul.

    The embedding touches only the top-n coefficients, so instead of a full
    inverse transform of the modified plane (2 dense W*H matmuls, the
    reference's Writer::result path at src/algorithm.rs:361-374) we invert
    just the delta:

        dY = (4/(W*H)) * D_h[:, rows] @ diag(delta) @ D_w[:, cols]^T

    an (H, n) @ (n, W) matmul -- ~3x fewer FLOPs at n=1000/1080p, and MORE
    accurate than the reference's round trip because unmodified pixels never
    pass through DCT->IDCT at all.

    ``delta``: (B, n) coefficient changes; ``idx``: (B, n) flat indices.
    Returns (B, H, W) luma deltas.
    """
    dh = jnp.asarray(dct.dct3_basis(h))  # (H, H): dh[k, m]
    dw = jnp.asarray(dct.dct3_basis(w))
    p = jax_precision(precision)
    rows = idx // w
    cols = idx % w
    # jnp.take with batched indices gives (H, B, n); normalize to (B, H, n).
    a = jnp.take(dh, rows, axis=1)  # D_h columns at each row index
    a = jnp.moveaxis(a, 0, 1) if a.ndim == 3 else a
    b = jnp.take(dw, cols, axis=1)
    b = jnp.moveaxis(b, 0, 1) if b.ndim == 3 else b
    scaled = a * delta[..., None, :]  # (B, H, n) * (B, 1, n)
    out = jnp.einsum("...hn,...wn->...hw", scaled, b, precision=p)
    return out * (4.0 / (w * h))


def _batched_gather(flat: jax.Array, idx: jax.Array) -> jax.Array:
    return jnp.take_along_axis(flat, idx, axis=-1)


def _batched_scatter(flat: jax.Array, idx: jax.Array, values: jax.Array) -> jax.Array:
    # Top-k indices are distinct, so a plain scatter-set is well defined.
    if flat.ndim == 1:
        return flat.at[idx].set(values, mode="promise_in_bounds")
    b = flat.shape[0]
    rows = jnp.arange(b, dtype=idx.dtype)[:, None]
    return flat.at[rows, idx].set(values, mode="promise_in_bounds")


def _shorter_axis(h: int, w: int) -> int:
    """Axis whose 1-D pass is cheaper to run in full: contract the shorter
    dimension first (mirrors the reference's larger-dim-first scratch-reuse
    ordering, src/dct2d.rs:93-98, but chosen here to minimize the full-pass
    FLOPs that the value path shares)."""
    return -2 if h <= w else -1


def _half_pass(rgb: jax.Array, precision, ax: int,
               allow_fused: bool) -> jax.Array:
    """Luma + one DCT-II pass along ``ax``, dispatched to the fused Pallas
    kernel on TPU when eligible (uint8, landscape, non-HIGHEST --
    :func:`..ops.fused_dct.supported`), else the XLA formulation."""
    if (ax == -2 and allow_fused
            and fused_dct.supported(rgb.shape, rgb.dtype, precision)):
        return fused_dct.luma_row_pass(rgb, precision)
    y = colorspace.rgb_to_luma(_to_f32(rgb))
    return dct.dct2_pass(y, axis=ax, precision=precision)


def _rank_and_values_fast(
    rgb: jax.Array,
    n: int,
    ordering,
    precision,
    custom_metric=None,
    allow_fused: bool = True,
) -> Tuple[jax.Array, jax.Array, tuple]:
    """Production prologue: ranked indices + exact coefficient values.

    Never materializes the full coefficient plane at working precision.
    One half-pass ``T`` over the shorter axis is shared by both consumers:

      * ranking: the other half-pass runs once in bf16 producing a
        *metric-only* plane, ranked with :func:`..ops.ranking.approx_top_indices`
        (TPU PartialReduce) -- the plane's values are never needed;
      * values: the n coefficients the modulation actually touches
        (reference: src/algorithm.rs:382-410 writes, :543-562 reads) are
        finished from ``T`` by a gather-dot at full precision.

    On TPU with uint8 input the half-pass runs through the fused Pallas
    kernel (:mod:`..ops.fused_dct`): luma conversion happens in-kernel so the
    f32 luma plane never touches HBM. The folded kernel variant
    (``fused_dct.USE_FOLD``) additionally halves the MXU FLOPs and returns an
    even/odd stacked row layout, so ranking goes through the index-mapped
    variant and downstream gather-dots use layout positions; the *returned*
    indices are always true row-major flat indices either way.

    vs the reference's Writer/Reader prologue (full 2-D transform + full
    comparison sort, src/algorithm.rs:308-342, 200-210): ~2.3x less matmul
    work and ~3x cheaper ranking at 1080p.

    Returns ``(idx, vals, ctx)`` where ``ctx`` lets the read path run the
    derived image through the identical transform: ``("folded", lidx)`` or
    ``("plain", ax)``.
    """
    h, w = rgb.shape[-3], rgb.shape[-2]
    allow_fused = allow_fused and custom_metric is None
    if (allow_fused and fused_dct.USE_FOLD
            and fused_dct.supported(rgb.shape, rgb.dtype, precision,
                                    fold=True)):
        t = fused_dct.luma_fold_row_pass(rgb, precision)
        rank_plane = dct.dct2_pass(
            t.astype(jnp.bfloat16), axis=-1, precision=Precision.DEFAULT)
        imap = jnp.asarray(fused_dct.true_index_map(h, w))
        with jax.named_scope("ssw.rank"):
            idx, lidx = ranking.approx_top_indices_mapped(
                rank_plane, n, ordering, imap, h, w)
        vals = dct.dct2_dot_at(t, lidx, contracted_axis=-2,
                               precision=precision)
        return idx, vals, ("folded", lidx)
    ax = _shorter_axis(h, w)
    t = _half_pass(rgb, precision, ax, allow_fused)
    other = -1 if ax == -2 else -2
    rank_plane = dct.dct2_pass(
        t.astype(jnp.bfloat16), axis=other, precision=Precision.DEFAULT)
    with jax.named_scope("ssw.rank"):
        idx = ranking.approx_top_indices(rank_plane, n, ordering,
                                         custom_metric=custom_metric)
    vals = dct.dct2_dot_at(t, idx, contracted_axis=ax, precision=precision)
    return idx, vals, ("plain", ax)


def _embed_fast(rgb: jax.Array, marks: jax.Array, config: WriteConfig,
                quantize: bool) -> jax.Array:
    """Fast embed path (non-HIGHEST precisions): shared half-pass + sparse
    everything. Same algorithm as :func:`embed`'s reference-exact path; the
    transform/ranking internals trade exact tie order and ~1.5% of boundary
    rank selections for ~1.6x throughput (see ``approx_top_indices``).
    Writer and Reader agree exactly because both derive indices from the base
    image with the same deterministic code."""
    n = marks.shape[-1]
    h, w = rgb.shape[-3], rgb.shape[-2]
    rgbf = _to_f32(rgb)
    with jax.named_scope("ssw.forward"):
        idx, original, _ = _rank_and_values_fast(
            rgb, n, config.ordering, config.precision, config.custom_ordering)
    if marks.ndim == 2:  # (M, N) shared across batch -> (B, M, N)
        marks = jnp.broadcast_to(marks[None],
                                 (original.shape[0],) + marks.shape)
    new_values = modulation.embed_marks(
        original, marks, config.insertion.method, config.insertion.alpha,
        custom_insert=config.custom_insert, indices=idx,
    )
    with jax.named_scope("ssw.inverse"):
        # Y is the only modified plane and the Y column of YIQ->RGB is
        # [1,1,1] (src/yiq.rs:161-165), so RGB' = clamp(RGB + dY).
        # The delta IDCT runs single-pass bf16: dy is itself a ~alpha-scale
        # perturbation, so bf16's ~0.4% relative error on it is ~0.04% of
        # the watermark signal -- invisible in sim (31.25 vs 31.24 sigma on
        # the cat-image gate) and 2.4x cheaper than the 3-pass form.
        dy = _sparse_idct_delta(
            new_values - original, idx, h, w, Precision.DEFAULT)
        out = jnp.clip(rgbf + dy[..., None], 0.0, 1.0)
    return colorspace.f32_to_u8(out) if quantize else out


def _extract_fast(base: jax.Array, derived: jax.Array, n: int,
                  config: ReadConfig) -> jax.Array:
    """Fast read path (non-HIGHEST): base prologue shared with
    :func:`_embed_fast`; the derived image gets one half-pass + gather-dot
    (its coefficients are only read at the base's n ranked indices,
    reference src/algorithm.rs:556-561)."""
    with jax.named_scope("ssw.forward"):
        # Base and derived must take the same transform path (the derived
        # gather-dot reads layout positions from the base's ranking).
        allow_fused = base.dtype == derived.dtype
        idx, base_vals, ctx = _rank_and_values_fast(
            base, n, config.ordering, config.precision,
            config.custom_ordering, allow_fused=allow_fused)
        if ctx[0] == "folded":
            td = fused_dct.luma_fold_row_pass(derived, config.precision)
            derived_vals = dct.dct2_dot_at(
                td, ctx[1], contracted_axis=-2, precision=config.precision)
        else:
            ax = ctx[1]
            td = _half_pass(derived, config.precision, ax, allow_fused)
            derived_vals = dct.dct2_dot_at(
                td, idx, contracted_axis=ax, precision=config.precision)
    if config.custom_extract is not None:
        return config.custom_extract(idx, base_vals, derived_vals)
    return modulation.extract_values(
        config.extraction.method, config.extraction.alpha, base_vals,
        derived_vals)


@functools.partial(jax.jit, static_argnames=("config", "quantize", "sparse_idct"))
def embed(
    rgb: jax.Array,
    marks: jax.Array,
    config: WriteConfig = WriteConfig(),
    quantize: bool = True,
    sparse_idct: bool = True,
) -> jax.Array:
    """Embed watermark(s) into a batch of images.

    Args:
      rgb: ``(B, H, W, 3)`` or ``(H, W, 3)``, uint8 or float32 in [0, 1].
      marks: ``(N,)`` single mark, ``(M, N)`` M marks shared across the batch,
        or ``(B, M, N)`` per-image marks. Multi-mark embedding is
        delta-additive (reference: src/algorithm.rs:382-410).
      config: insertion method/alpha + ordering (reference WriteConfig,
        src/algorithm.rs:99-112).
      quantize: if True, return uint8 (the reference's ``into_rgb8`` path);
        else float32 RGB.
      sparse_idct: invert only the n modified coefficients via the skinny
        matmul (default, faster and more accurate); False forces the
        reference-style full inverse transform of the modified plane.

    Returns: watermarked images, same leading shape as ``rgb``.
    """
    single_image = rgb.ndim == 3
    if single_image:
        rgb = rgb[None]
    if marks.ndim == 1:
        marks = marks[None]
    n = marks.shape[-1]

    if config.precision is not Precision.HIGHEST and sparse_idct:
        # Production path: shared half-pass, metric-only rank plane,
        # PartialReduce ranking, all-sparse value/inverse work.
        out = _embed_fast(rgb, marks, config, quantize)
        return out[0] if single_image else out

    with jax.named_scope("ssw.forward"):
        rgbf = _to_f32(rgb)
        y_in = colorspace.rgb_to_luma(rgbf)
        coeffs = dct.dct2_2d(y_in, precision=config.precision)
    h, w = coeffs.shape[-2], coeffs.shape[-1]
    with jax.named_scope("ssw.rank"):
        idx = ranking.top_indices(coeffs, n, config.ordering,
                                  custom_metric=config.custom_ordering)

    flat = coeffs.reshape(coeffs.shape[0], -1)
    original = _batched_gather(flat, idx)
    if marks.ndim == 2:  # (M, N) shared across batch -> (B, M, N)
        marks = jnp.broadcast_to(marks[None], (flat.shape[0],) + marks.shape)
    new_values = modulation.embed_marks(
        original, marks, config.insertion.method, config.insertion.alpha,
        custom_insert=config.custom_insert, indices=idx,
    )

    if sparse_idct:
        # Only Y changes, and the Y column of YIQ_TO_RGB is exactly
        # [1, 1, 1] (R = Y + ..i.. + ..q.., reference src/yiq.rs:161-165),
        # so RGB' = clamp(RGB + dY) -- the I/Q planes and the output 3x3
        # conversion drop out of the computation entirely.
        with jax.named_scope("ssw.inverse"):
            dy = _sparse_idct_delta(
                new_values - original, idx, h, w, config.precision)
            out = jnp.clip(rgbf + dy[..., None], 0.0, 1.0)
    else:
        yiq = colorspace.rgb_to_yiq(rgbf)
        flat = _batched_scatter(flat, idx, new_values)
        y = dct.idct2_2d(flat.reshape(-1, h, w), precision=config.precision)
        out = colorspace.yiq_to_rgb(
            jnp.concatenate([y[..., None], yiq[..., 1:]], axis=-1))
    if quantize:
        out = colorspace.f32_to_u8(out)
    if single_image:
        out = out[0]
    return out


@functools.partial(jax.jit, static_argnames=("config", "n"))
def prepare_base(
    rgb: jax.Array,
    n: int,
    config: ReadConfig = ReadConfig(),
) -> Tuple[jax.Array, jax.Array]:
    """Forward-transform the base (original) image and rank its coefficients.

    Equivalent to ``Reader::base`` (reference: src/algorithm.rs:462-498).
    Returns ``(flat_coefficients, top_n_indices)``; cache this to amortize the
    base transform across many derived images (the reference CLI's extraction
    cache, examples/main.rs:369-412).
    """
    single_image = rgb.ndim == 3
    if single_image:
        rgb = rgb[None]
    coeffs = _forward(rgb, config.precision)
    idx = ranking.top_indices(coeffs, n, config.ordering,
                              custom_metric=config.custom_ordering)
    flat = coeffs.reshape(coeffs.shape[0], -1)
    if single_image:
        return flat[0], idx[0]
    return flat, idx


@functools.partial(jax.jit, static_argnames=("config",))
def prepare_derived(
    rgb: jax.Array,
    config: ReadConfig = ReadConfig(),
) -> jax.Array:
    """Forward-transform a derived (watermarked) image: coefficients only.

    Equivalent to ``Reader::derived`` (reference: src/algorithm.rs:469-480) --
    no ordering, no extraction config.
    """
    single_image = rgb.ndim == 3
    if single_image:
        rgb = rgb[None]
    coeffs = _forward(rgb, config.precision)
    flat = coeffs.reshape(coeffs.shape[0], -1)
    return flat[0] if single_image else flat


@functools.partial(jax.jit, static_argnames=("config",))
def extract_prepared(
    base_flat: jax.Array,
    idx: jax.Array,
    derived_flat: jax.Array,
    config: ReadConfig = ReadConfig(),
) -> jax.Array:
    """Extract mark values given prepared base/derived coefficients.

    Vectorized form of ``Reader::extract_watermark``
    (reference: src/algorithm.rs:543-562): gather both coefficient sets at the
    ranked indices and invert the embedding equation.
    """
    base_vals = _batched_gather(base_flat, idx)
    derived_vals = _batched_gather(derived_flat, idx)
    if config.custom_extract is not None:
        return config.custom_extract(idx, base_vals, derived_vals)
    return modulation.extract_values(
        config.extraction.method, config.extraction.alpha, base_vals, derived_vals
    )


@functools.partial(jax.jit, static_argnames=("config", "n"))
def _extract_fused(
    base: jax.Array,
    derived: jax.Array,
    n: int,
    config: ReadConfig,
) -> jax.Array:
    """Fused read path: full transform of base, sparse transform of derived.

    The base image needs its full coefficient plane (the ranking metric reads
    every coefficient), but the derived image's coefficients are only ever
    read at the base's n ranked indices (reference: src/algorithm.rs:556-561),
    so its transform runs through :func:`..ops.dct.dct2_coeffs_at` -- one
    1-D pass plus a gather-dot instead of a second full pass.
    """
    if config.precision is not Precision.HIGHEST:
        return _extract_fast(base, derived, n, config)
    coeffs = _forward(base, config.precision)
    idx = ranking.top_indices(coeffs, n, config.ordering,
                              custom_metric=config.custom_ordering)
    flat = coeffs.reshape(coeffs.shape[0], -1)
    base_vals = _batched_gather(flat, idx)
    yd = colorspace.rgb_to_luma(_to_f32(derived))
    derived_vals = dct.dct2_coeffs_at(yd, idx, precision=config.precision)
    if config.custom_extract is not None:
        return config.custom_extract(idx, base_vals, derived_vals)
    return modulation.extract_values(
        config.extraction.method, config.extraction.alpha, base_vals, derived_vals
    )


def extract(
    base: jax.Array,
    derived: jax.Array,
    n: int,
    config: ReadConfig = ReadConfig(),
    sparse_derived: bool = True,
) -> jax.Array:
    """Extract length-``n`` watermark(s): full read path, batched.

    ``base`` and ``derived`` are ``(B, H, W, 3)`` or ``(H, W, 3)`` images.
    ``sparse_derived`` (default) computes the derived image's coefficients
    only at the n ranked indices (~1.4x faster read path at 1080p); False
    forces the reference-style full second transform.
    Raises ValueError on the conditions the reference panics on
    (src/algorithm.rs:550-555): mismatched image sizes, or ``n`` not below
    the coefficient count (the reference's check is ``>=``, off-by-one
    included, so ``n`` must be strictly less than W*H).
    """
    if base.shape != derived.shape:
        raise ValueError(
            "Derived coefficient length not equal to base coefficient length: "
            f"base {base.shape} vs derived {derived.shape}"
        )
    h, w = base.shape[-3], base.shape[-2]
    if n >= h * w:
        raise ValueError("Desired extraction length exceeds available coefficients.")
    if sparse_derived:
        single_image = base.ndim == 3
        if single_image:
            base, derived = base[None], derived[None]
        out = _extract_fused(base, derived, n, config)
        return out[0] if single_image else out
    base_flat, idx = prepare_base(base, n, config)
    derived_flat = prepare_derived(derived, config)
    return extract_prepared(base_flat, idx, derived_flat, config)


similarity = jax.jit(modulation.similarity)
