"""Fused luma + row-DCT Pallas kernels: the production prologue.

Every pipeline (Writer, Reader base, Reader derived) begins with the same two
stages: u8 RGB -> luma, then one 1-D DCT-II pass contracting H (reference:
src/algorithm.rs:308-342 runs RGB->YIQ then dct2_2d row+col passes per image;
src/dct2d.rs:6-7 admits the serial implementation is unoptimised). On TPU
those two stages are bandwidth-bound back to back: XLA materializes the f32
luma plane (8.3 MB at 1080p) in HBM between them. The kernels here fuse them:
the f32 luma plane never exists in HBM.

Shared techniques:

  * **Integer luma**: colorsys luma is ``(30 R + 59 G + 11 B) / 25500`` over
    u8 inputs. The numerators (|.| <= 25500 < 2^24, fold sums <= 51000) are
    exact in f32; the 1/25500 is folded into the basis on the host. In-kernel
    luma costs three VPU multiply-adds per element.
  * **Split-precision matmuls**: Mosaic only exposes DEFAULT/HIGHEST dot
    precision, so the 3-pass bf16 decomposition XLA uses for
    ``Precision.HIGH`` (hi*hi + hi*lo + lo*hi) is done manually with hi/lo
    bf16 splits of both the image data and the basis. Measured accuracy is
    *better* than XLA-HIGH on the same pass (the integer luma is exact where
    XLA's f32 luma has already rounded).

Two variants, A/B-measured on TPU v5e at 1080p (B=32, 3-pass HIGH):

  * **Dense** (``luma_row_pass``, the production default): one (HP, HP)
    basis contraction per W-tile, output in true row order. 137 us/img vs
    XLA's 144 us/img for the same luma+pass stage, and ~1.8x more accurate
    than XLA-HIGH.
  * **Folded** (``luma_fold_row_pass``): the DCT-II basis obeys
    ``C[k, N-1-m] = (-1)^k C[k, m]``, so even output rows contract
    ``s = y_top + reverse(y_bottom)`` and odd rows ``d = y_top - rev(y_bot)``
    -- two (H/2, H/2) matmuls, half the MXU FLOPs. Measured **slower** than
    dense (194-197 us/img): at H=1080 the half-size (544-padded) dots run at
    ~26% MXU utilization vs ~50% for the dense (1088) dots -- partial-tile
    waste and per-dot overheads eat the 2x FLOP saving. (A pure-XLA fold
    loses the same way: 189 us/img.) Kept selectable because the balance
    flips for larger planes where the basis no longer fits VMEM densely.

The folded output layout is **even/odd stacked**: row ``q`` holds true
coefficient row ``2q`` and row ``KP + q`` true row ``2q + 1`` (``KP`` =
padded half-height). Mosaic has no sublane ``flip``, so the bottom-half
reversal rides the XLA-side planarization copy, and instead of an in-kernel
interleave consumers get a constant :func:`true_index_map` and remap as free
index arithmetic (ranking works on flat indices and the gather-dot reads
whatever rows it is asked for -- see models/pipeline.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Precision
from . import dct

LANE = 128          # TPU lane tile
SUBLANE_U8 = 32     # u8 sublane tile
# Out of the ~16 MB/core VMEM; the 1080p dense config (13.8 MB estimated at
# TW=384, double-buffered in/out included) is measured-good on v5e.
_VMEM_BUDGET = 14 * 1024 * 1024

# Test hook: force the kernel on (in interpret mode) off-TPU. Flip with
# jax.clear_caches() -- dispatch happens at trace time.
_FORCE_INTERPRET = False

# Pipeline dispatch, default OFF: the dense kernel wins the isolated stage
# A/B (137 vs 144 us/img at 1080p HIGH, B=32, v5e -- and is ~1.8x more
# accurate than XLA-HIGH), but in the full pipeline the driver bench drops
# 1143 -> 1111 img/s with it enabled: the opaque kernel boundary blocks XLA's
# context fusions (the planarization prep copy fuses with nothing, and the
# embed path re-reads the u8 input for its output add either way). Flip +
# jax.clear_caches() to A/B on other hardware or shapes.
ENABLE_PROLOGUE = False

# Folded variant: measured slower still (194-197 us/img isolated; a pure-XLA
# fold also loses at 189). See module docstring.
USE_FOLD = False


def _pad_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def kp_for(h: int) -> int:
    """Padded half-height: rows per parity block of the folded output."""
    return _pad_up(h // 2, SUBLANE_U8)


def _vmem_estimate(h: int, tw: int, n_dots: int, fold: bool) -> int:
    if fold:
        kp = kp_for(h)
        basis = (4 if n_dots == 3 else 2) * kp * kp * 2
        inputs = 2 * 3 * kp * tw        # two u8 half-plane stacks
        out = 2 * kp * tw * 4
        scratch = 2 * kp * tw * 4 + 4 * kp * tw * 2 + 2 * kp * tw * 4
    else:
        hp = _pad_up(h, SUBLANE_U8)
        basis = (2 if n_dots == 3 else 1) * hp * hp * 2
        inputs = 3 * hp * tw
        out = hp * tw * 4
        scratch = hp * tw * 4 + 2 * hp * tw * 2
    return basis + 2 * inputs + 2 * out + scratch


def _tile_w(h: int, wp: int, n_dots: int, fold: bool) -> int | None:
    """Widest W tile that divides the padded width and fits VMEM, or None."""
    for tw in (512, 384, 256, 128):
        if wp % tw == 0 and _vmem_estimate(h, tw, n_dots, fold) <= _VMEM_BUDGET:
            return tw
    return None


def supported(shape, dtype, precision: Precision, fold: bool = False) -> bool:
    """True when the fused kernel can run this configuration.

    Requirements: uint8 input, landscape/square images (the kernel contracts
    H; portrait images take the XLA path which contracts W -- the cheaper
    axis either way; even H additionally required for ``fold``), a
    non-HIGHEST precision (HIGHEST is the reference-exact f32 path), VMEM
    fit, and a TPU backend (or the test interpret override).
    """
    if len(shape) < 3 or shape[-1] != 3:
        return False
    h, w = shape[-3], shape[-2]
    if dtype != jnp.uint8 or h > w or h < 2 * SUBLANE_U8:
        return False
    if fold and h % 2:
        return False
    if precision not in (Precision.DEFAULT, Precision.HIGH):
        return False
    n_dots = 3 if precision is Precision.HIGH else 1
    if _tile_w(h, _pad_up(w, LANE), n_dots, fold) is None:
        return False
    if _FORCE_INTERPRET:
        return True
    return ENABLE_PROLOGUE and _on_tpu()


@functools.lru_cache(maxsize=16)
def _basis_blocks(h: int, n_dots: int):
    """Host-precomputed folded bases with the 1/25500 luma scale baked in.

    Returns numpy (ce_hi, ce_lo, co_hi, co_lo) each (KP, KP) bfloat16 (lo
    terms are None for single-dot DEFAULT precision). Numpy, not jnp: this is
    lru-cached and may be hit inside a jit trace, where jnp values would be
    tracers (leaking them across traces breaks later jits).
    """
    half = h // 2
    kp = kp_for(h)
    c = dct.dct2_basis(h).astype(np.float64) / 25500.0
    ce = np.zeros((kp, kp), np.float64)
    co = np.zeros((kp, kp), np.float64)
    ce[: (h + 1) // 2, :half] = c[0::2, :half]
    co[: h // 2, :half] = c[1::2, :half]

    def hi_lo(m):
        f = m.astype(np.float32)
        hi = f.astype(jnp.bfloat16)  # numpy array with the ml_dtypes dtype
        if n_dots == 1:
            return hi, None
        lo = (f - hi.astype(np.float32)).astype(jnp.bfloat16)
        return hi, lo

    ce_hi, ce_lo = hi_lo(ce)
    co_hi, co_lo = hi_lo(co)
    return ce_hi, ce_lo, co_hi, co_lo


def _make_kernel(n_dots: int, kp: int):
    dn = (((1,), (0,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)

    def split(x):
        hi = x.astype(jnp.bfloat16)
        if n_dots == 1:
            return hi, None
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def three_dot(c_hi, c_lo, x_hi, x_lo):
        acc = dot(c_hi, x_hi)
        if n_dots == 3:
            acc = acc + dot(c_hi, x_lo) + dot(c_lo, x_hi)
        return acc

    if n_dots == 3:
        def kernel(a_ref, b_ref, cehi_ref, celo_ref, cohi_ref, colo_ref,
                   out_ref):
            _body(a_ref, b_ref, cehi_ref[:], celo_ref[:], cohi_ref[:],
                  colo_ref[:], out_ref)
    else:
        def kernel(a_ref, b_ref, cehi_ref, cohi_ref, out_ref):
            _body(a_ref, b_ref, cehi_ref[:], None, cohi_ref[:], None, out_ref)

    def _body(a_ref, b_ref, ce_hi, ce_lo, co_hi, co_lo, out_ref):
        na = (30 * a_ref[0, 0].astype(jnp.int32)
              + 59 * a_ref[1, 0].astype(jnp.int32)
              + 11 * a_ref[2, 0].astype(jnp.int32))
        nb = (30 * b_ref[0, 0].astype(jnp.int32)
              + 59 * b_ref[1, 0].astype(jnp.int32)
              + 11 * b_ref[2, 0].astype(jnp.int32))
        s_hi, s_lo = split((na + nb).astype(jnp.float32))
        d_hi, d_lo = split((na - nb).astype(jnp.float32))
        out_ref[0, :kp] = three_dot(ce_hi, ce_lo, s_hi, s_lo)
        out_ref[0, kp:] = three_dot(co_hi, co_lo, d_hi, d_lo)

    return kernel


@functools.lru_cache(maxsize=64)
def true_index_map(h: int, w: int) -> np.ndarray:
    """Constant (2*KP, w) int32 map: folded-layout position -> true flat index.

    Row ``q`` holds true row ``2q``; row ``KP + q`` true row ``2q + 1``.
    Padding rows (from the sublane round-up of H/2) map to the sentinel
    ``h * w`` so the ranking's out-of-range mask (-inf metric) drops them.
    """
    kp = kp_for(h)
    rows_p = np.arange(2 * kp)
    true_row = np.where(rows_p < kp, 2 * rows_p, 2 * (rows_p - kp) + 1)
    valid = true_row < h
    cols = np.arange(w)
    idx = true_row[:, None] * w + cols[None, :]
    return np.where(valid[:, None], idx, h * w).astype(np.int32)


def luma_fold_row_pass(
    rgb: jax.Array,
    precision: Precision,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """u8 RGB (B, H, W, 3) -> folded-layout H-pass DCT coefficients.

    Equivalent to ``dct.dct2_pass(colorspace.rgb_to_luma(u8_to_f32(rgb)),
    axis=-2, precision=precision)`` up to the given precision tier's rounding,
    but returned in even/odd stacked row layout of shape (B, 2*KP, W); see the
    module docstring and :func:`true_index_map`.
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU tests run the kernel interpreted
    b, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    half = h // 2
    kp = kp_for(h)
    wp = _pad_up(w, LANE)
    n_dots = 3 if precision is Precision.HIGH else 1
    tw = _tile_w(h, wp, n_dots, fold=True)

    top = jnp.moveaxis(rgb[:, :half], -1, 0)                 # (3, B, half, W)
    bot = jnp.moveaxis(rgb[:, h - 1: half - 1: -1], -1, 0)   # reversed bottom
    pad = ((0, 0), (0, 0), (0, kp - half), (0, wp - w))
    top = jnp.pad(top, pad)
    bot = jnp.pad(bot, pad)

    basis = _basis_blocks(h, n_dots)
    basis_args = tuple(
        jnp.asarray(m) for m in (basis if n_dots == 3
                                 else (basis[0], basis[2])))
    spec_img = pl.BlockSpec((3, 1, kp, tw), lambda i, j: (0, i, 0, j),
                            memory_space=pltpu.VMEM)
    spec_basis = pl.BlockSpec((kp, kp), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_kernel(n_dots, kp),
        out_shape=jax.ShapeDtypeStruct((b, 2 * kp, wp), jnp.float32),
        grid=(b, wp // tw),
        in_specs=[spec_img, spec_img] + [spec_basis] * len(basis_args),
        out_specs=pl.BlockSpec((1, 2 * kp, tw), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=n_dots * 2 * b * 2 * half * half * wp,
            bytes_accessed=6 * b * kp * wp + 8 * b * kp * wp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(top, bot, *basis_args)
    return out[..., :w]


@functools.lru_cache(maxsize=16)
def _dense_basis_blocks(h: int, n_dots: int):
    """Host-precomputed dense basis (HP, HP) with the luma scale baked in.

    Returns numpy (c_hi, c_lo) bfloat16 (c_lo None for DEFAULT). Numpy for
    the same trace-safety reason as :func:`_basis_blocks`.
    """
    hp = _pad_up(h, SUBLANE_U8)
    c = np.zeros((hp, hp), np.float64)
    c[:h, :h] = dct.dct2_basis(h).astype(np.float64) / 25500.0
    f = c.astype(np.float32)
    hi = f.astype(jnp.bfloat16)
    if n_dots == 1:
        return hi, None
    lo = (f - hi.astype(np.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_dense_kernel(n_dots: int):
    dn = (((1,), (0,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)

    def luma(ref):
        return (30 * ref[0, 0].astype(jnp.int32)
                + 59 * ref[1, 0].astype(jnp.int32)
                + 11 * ref[2, 0].astype(jnp.int32)).astype(jnp.float32)

    if n_dots == 3:
        def kernel(img_ref, chi_ref, clo_ref, out_ref):
            y = luma(img_ref)
            y_hi = y.astype(jnp.bfloat16)
            y_lo = (y - y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            out_ref[0] = (dot(chi_ref[:], y_hi) + dot(chi_ref[:], y_lo)
                          + dot(clo_ref[:], y_hi))
    else:
        def kernel(img_ref, chi_ref, out_ref):
            out_ref[0] = dot(chi_ref[:], luma(img_ref).astype(jnp.bfloat16))

    return kernel


def luma_row_pass(
    rgb: jax.Array,
    precision: Precision,
    *,
    interpret: bool | None = None,
) -> jax.Array:
    """u8 RGB (B, H, W, 3) -> H-pass DCT coefficients (B, H, W), true order.

    The production fused prologue: equivalent to
    ``dct.dct2_pass(colorspace.rgb_to_luma(u8_to_f32(rgb)), axis=-2,
    precision=precision)`` up to the precision tier's rounding (measured more
    accurate than the XLA formulation at HIGH -- the integer luma is exact).
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    hp = _pad_up(h, SUBLANE_U8)
    wp = _pad_up(w, LANE)
    n_dots = 3 if precision is Precision.HIGH else 1
    tw = _tile_w(h, wp, n_dots, fold=False)

    planes = jnp.moveaxis(rgb, -1, 0)  # (3, B, H, W) u8 planar
    planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))

    basis = _dense_basis_blocks(h, n_dots)
    basis_args = tuple(jnp.asarray(m) for m in basis if m is not None)
    spec_img = pl.BlockSpec((3, 1, hp, tw), lambda i, j: (0, i, 0, j),
                            memory_space=pltpu.VMEM)
    spec_basis = pl.BlockSpec((hp, hp), lambda i, j: (0, 0),
                              memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _make_dense_kernel(n_dots),
        out_shape=jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        grid=(b, wp // tw),
        in_specs=[spec_img] + [spec_basis] * len(basis_args),
        out_specs=pl.BlockSpec((1, hp, tw), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=n_dots * 2 * b * h * h * wp,
            bytes_accessed=3 * b * hp * wp + 4 * b * hp * wp,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, *basis_args)
    return out[:, :h, :w]


def unfold_rows(t_folded: jax.Array, h: int) -> jax.Array:
    """Reorder a folded-layout plane back to true row order (test helper)."""
    kp = t_folded.shape[-2] // 2
    te = t_folded[..., :kp, :]
    to = t_folded[..., kp:, :]
    inter = jnp.stack([te, to], axis=-2)
    inter = inter.reshape(*t_folded.shape[:-2], 2 * kp, t_folded.shape[-1])
    return inter[..., :h, :]
