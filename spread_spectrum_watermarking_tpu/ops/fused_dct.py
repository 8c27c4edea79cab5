"""Fused Pallas kernels for the production pipeline's prologue and epilogue.

Every pipeline (Writer, Reader base) begins with u8 RGB -> luma -> one 1-D
DCT-II pass (reference: src/algorithm.rs:308-342 runs RGB->YIQ then dct2_2d
row+col passes per image; src/dct2d.rs:6-7 admits the serial implementation
is unoptimised), and the Writer ends with u8 RGB + dY -> clip -> quantize ->
u8 (reference: Writer::result + into_rgb8, src/algorithm.rs:361-379). On TPU
both ends are bandwidth-bound chains of elementwise stages around one matmul;
the kernels here fuse each chain so the intermediates (f32 luma plane, f32
dY plane, f32 RGB output) never exist in HBM.

Shared techniques:

  * **Integer luma**: colorsys luma is ``(30 R + 59 G + 11 B) / 25500`` over
    u8 inputs. The numerators (<= 25500 < 2^24) are exact in f32; the
    1/25500 is folded into the DCT basis on the host. In-kernel luma costs
    three VPU multiply-adds per element.
  * **Split-precision matmuls**: Mosaic only exposes DEFAULT/HIGHEST dot
    precision, so the 3-pass bf16 decomposition XLA uses for
    ``Precision.HIGH`` (hi*hi + hi*lo + lo*hi) is done manually with hi/lo
    bf16 splits of both the image data and the basis. Measured accuracy is
    *better* than XLA-HIGH on the same pass (the integer luma is exact where
    XLA's f32 luma has already rounded).
  * **Resident-first contraction tiling**: the plan prefers keeping the
    whole (K, H) basis resident in VMEM (its block index is then constant,
    so it is DMA'd once for the entire grid -- batch included -- and needs
    no second pipeline buffer). Only when residency cannot fit (4K at the
    3-dot HIGH tier: ~19 MB of hi+lo basis) does the contraction move onto
    the innermost grid axis with a VMEM scratch accumulator, streaming the
    basis in (K, TH) panels -- correct everywhere, but it re-streams the
    basis once per output column tile, so the resident plan is strictly
    preferred. Portrait images contract W instead of H. The reference
    handles any W x H serially (src/dct2d.rs:83-98).

A previous generation of kernels (an even/odd "folded" row pass exploiting
``C[k, N-1-m] = (-1)^k C[k, m]``, plus a whole-image 2-D kernel in
ops/dct_pallas.py) was A/B-measured slower in context on v5e (folded:
194-197 us/img vs dense 137; the 2-D kernel was superseded) and has been
removed -- see git history for the measurements.
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
# Out of the ~16 MB/core VMEM, leave headroom for double buffering.
_VMEM_BUDGET = 13 * 1024 * 1024

# Test hook: force the kernels on (in interpret mode) off-TPU. Flip with
# jax.clear_caches() -- dispatch happens at trace time.
_FORCE_INTERPRET = False

# Production dispatch flags; see models/pipeline.py for the call sites and
# BENCH history for the in-context A/B numbers on v5e.
#
# Prologue: ON, but ``supported`` additionally requires a RESIDENT basis and
# a 4K-class contraction (isolated A/B on v5e-1: 4K DEFAULT kernel 536.5 vs
# XLA 627.3 us/img; 1080p HIGH 160.6 vs 154.2 -- at 1080p the XLA pass wins
# once context fusion is counted, so the kernel only dispatches where the
# basis stays resident and the XLA operand materialization is 4K-sized).
# Epilogue: OFF -- the Mosaic-imposed pre-interleaved width factor costs 3x
# the skinny-matmul flops and loses 400.3 vs 140.5 us/img at 1080p (bit-exact
# otherwise); kept for the record and for layout experiments.
ENABLE_PROLOGUE = True
ENABLE_EPILOGUE = False
# Contracted dims >= this dispatch to the kernel when the basis is resident;
# below it the XLA pass wins (see the A/B above).
_PROLOGUE_MIN_CONTRACT = 2000


def _pad_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except RuntimeError:
        return False


def _n_dots(precision: Precision) -> int:
    return 3 if precision is Precision.HIGH else 1


# ---------------------------------------------------------------------------
# Prologue: fused luma + one DCT-II pass, tiled contraction
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _basis_hi_lo(n: int, n_dots: int, kp: int, np_pad: int, transpose: bool):
    """(kp, np_pad) [or transposed] bf16 hi/lo split of the scaled DCT basis.

    The 1/25500 integer-luma scale is baked in. Returns numpy arrays (lo is
    None for single-dot DEFAULT precision) -- numpy, not jnp, because this is
    lru-cached and may be hit inside a jit trace.
    """
    c = np.zeros((kp, np_pad), np.float64)
    c[:n, :n] = dct.dct2_basis(n).astype(np.float64) / 25500.0
    if transpose:
        c = c.T
    f = c.astype(np.float32)
    hi = f.astype(jnp.bfloat16)
    if n_dots == 1:
        return hi, None
    lo = (f - hi.astype(np.float32)).astype(jnp.bfloat16)
    return hi, lo


def _luma_f32(img_ref):
    """(3, 1, S, L) u8 block -> (S, L) f32 integer luma (exact, x25500)."""
    return (30 * img_ref[0, 0].astype(jnp.int32)
            + 59 * img_ref[1, 0].astype(jnp.int32)
            + 11 * img_ref[2, 0].astype(jnp.int32)).astype(jnp.float32)


def _split(x, n_dots):
    hi = x.astype(jnp.bfloat16)
    if n_dots == 1:
        return hi, None
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_pass_kernel(n_dots: int, n_chunks: int, out_dtype, contract_sublane: bool):
    """Kernel computing one DCT pass with the contraction on grid axis 2.

    ``contract_sublane=True``: out(K, TW) += C(K, TH) @ luma(TH, TW)
    (the row pass, contracting H). ``False``: out(TH, K) += luma(TH, TWc)
    @ Ct(TWc, K) (the column pass, contracting W -- the portrait case).
    """
    if contract_sublane:
        dn = (((1,), (0,)), ((), ()))   # C (K, TH) x y (TH, TW)
    else:
        dn = (((1,), (0,)), ((), ()))   # y (TH, TWc) x Ct (TWc, K)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)

    def body(img_ref, c_hi, c_lo, out_ref, acc_ref):
        y_hi, y_lo = _split(_luma_f32(img_ref), n_dots)
        if contract_sublane:
            part = dot(c_hi, y_hi)
            if n_dots == 3:
                part = part + dot(c_hi, y_lo) + dot(c_lo, y_hi)
        else:
            part = dot(y_hi, c_hi)
            if n_dots == 3:
                part = part + dot(y_lo, c_hi) + dot(y_hi, c_lo)
        if n_chunks == 1:  # resident basis: no accumulation state needed
            out_ref[0] = part.astype(out_dtype)
            return
        ct = pl.program_id(2)

        @pl.when(ct == 0)
        def _():
            acc_ref[:] = part

        @pl.when(ct != 0)
        def _():
            acc_ref[:] = acc_ref[:] + part

        @pl.when(ct == n_chunks - 1)
        def _():
            out_ref[0] = acc_ref[:].astype(out_dtype)

    if n_dots == 3 and n_chunks == 1:
        def kernel(img_ref, chi_ref, clo_ref, out_ref):
            body(img_ref, chi_ref[:], clo_ref[:], out_ref, None)
    elif n_dots == 3:
        def kernel(img_ref, chi_ref, clo_ref, out_ref, acc_ref):
            body(img_ref, chi_ref[:], clo_ref[:], out_ref, acc_ref)
    elif n_chunks == 1:
        def kernel(img_ref, chi_ref, out_ref):
            body(img_ref, chi_ref[:], None, out_ref, None)
    else:
        def kernel(img_ref, chi_ref, out_ref, acc_ref):
            body(img_ref, chi_ref[:], None, out_ref, acc_ref)
    return kernel


def _row_pass_plan(h: int, w: int, n_dots: int, out_bytes: int):
    """(TH, TW, kp, hp, wp) tiling for the H-contraction, or None.

    TH is the contraction chunk. Full residency (TH = padded H: one chunk,
    basis DMA'd once, no accumulator) is tried first; streamed panels are
    the fallback.
    """
    kp = _pad_up(h, SUBLANE_U8)
    wp = _pad_up(w, LANE)
    arrays = 2 if n_dots == 3 else 1  # hi (+ lo)
    for th in (_pad_up(h, SUBLANE_U8), 512, 256, 128):
        hp = _pad_up(h, th)
        n_chunks = hp // th
        basis = arrays * kp * th * 2 * (1 if n_chunks == 1 else 2)
        for tw in (512, 384, 256, 128):
            if wp % tw:
                continue
            img = 2 * 3 * th * tw                     # u8, double-buffered
            acc = 0 if n_chunks == 1 else kp * tw * 4
            out = 2 * kp * tw * out_bytes
            if basis + img + acc + out <= _VMEM_BUDGET:
                return th, tw, kp, hp, wp
    return None


def _col_pass_plan(h: int, w: int, n_dots: int, out_bytes: int):
    """(TH, TWc, kp, hp, wp) tiling for the W-contraction (portrait).

    TWc is the contraction chunk; residency first, as in the row plan.
    """
    kp = _pad_up(w, LANE)
    hp = _pad_up(h, SUBLANE_U8)
    arrays = 2 if n_dots == 3 else 1
    for twc in (_pad_up(w, LANE), 512, 256, 128):
        wpc = _pad_up(w, twc)
        n_chunks = wpc // twc
        basis = arrays * twc * kp * 2 * (1 if n_chunks == 1 else 2)
        for th in (512, 384, 256, 128):
            if hp % th:
                continue
            img = 2 * 3 * th * twc
            acc = 0 if n_chunks == 1 else th * kp * 4
            out = 2 * th * kp * out_bytes
            if basis + img + acc + out <= _VMEM_BUDGET:
                return th, twc, kp, hp, wpc
    return None


def supported(shape, dtype, precision: Precision,
              out_bytes: int = 2) -> bool:
    """True when the fused prologue kernel can run this configuration.

    Requirements: uint8 (B, H, W, 3) input, a non-HIGHEST precision (HIGHEST
    is the reference-exact f32 path), a tiling that fits VMEM (any practical
    H x W does, 4K and portrait included -- the contraction is tiled), and a
    TPU backend (or the test interpret override). ``out_bytes`` matches the
    ``out_dtype`` the caller will request (the pipeline reads bf16).
    """
    if len(shape) != 4 or shape[-1] != 3 or dtype != jnp.uint8:
        return False
    h, w = shape[-3], shape[-2]
    if min(h, w) < 2 * SUBLANE_U8:
        return False
    if precision not in (Precision.DEFAULT, Precision.HIGH):
        return False
    nd = _n_dots(precision)
    plan = (_row_pass_plan(h, w, nd, out_bytes) if h <= w
            else _col_pass_plan(h, w, nd, out_bytes))
    if plan is None:
        return False
    if _FORCE_INTERPRET:
        return True
    # Production rule (measured, see module flags): resident basis only,
    # 4K-class contraction only.
    # Row plan: (TH, TW, kp, hp, wp), contraction chunk TH; col plan:
    # (TH, TWc, kp, hp, wpc), contraction chunk TWc.
    resident = (plan[0] == plan[3]) if h <= w else (plan[1] == plan[4])
    return (ENABLE_PROLOGUE and _on_tpu() and resident
            and min(h, w) >= _PROLOGUE_MIN_CONTRACT)


def luma_pass(rgb: jax.Array, precision: Precision, *,
              out_dtype=jnp.float32, interpret: bool | None = None) -> jax.Array:
    """u8 RGB (B, H, W, 3) -> luma -> one DCT-II pass over the shorter axis.

    Equivalent to ``dct.dct2_pass(colorspace.rgb_to_luma(u8_to_f32(rgb)),
    axis=(-2 if h <= w else -1), precision=precision)`` up to the precision
    tier's rounding (measured more accurate than the XLA formulation at HIGH
    -- the integer luma is exact). The f32 luma plane never exists in HBM.
    Output is (B, H, W) in true row-major order, ``out_dtype``.
    """
    if interpret is None:
        interpret = not _on_tpu()  # CPU tests run the kernel interpreted
    b, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    nd = _n_dots(precision)
    out_bytes = jnp.dtype(out_dtype).itemsize
    planes = jnp.moveaxis(rgb, -1, 0)  # (3, B, H, W) u8 planar

    if h <= w:  # contract H (row pass)
        th, tw, kp, hp, wp = _row_pass_plan(h, w, nd, out_bytes)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        basis = _basis_hi_lo(h, nd, kp, hp, transpose=False)
        basis_args = tuple(jnp.asarray(m) for m in basis if m is not None)
        n_chunks = hp // th
        grid = (b, wp // tw, n_chunks)
        spec_img = pl.BlockSpec((3, 1, th, tw), lambda i, j, c: (0, i, c, j),
                                memory_space=pltpu.VMEM)
        spec_basis = pl.BlockSpec((kp, th), lambda i, j, c: (0, c),
                                  memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, kp, tw), lambda i, j, c: (i, 0, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, kp, wp), out_dtype)
        acc_shape = (kp, tw)
        flops = nd * 2 * b * h * h * wp
        contract_sublane = True
    else:  # contract W (column pass -- portrait)
        th, twc, kp, hp, wp = _col_pass_plan(h, w, nd, out_bytes)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        basis = _basis_hi_lo(w, nd, kp, wp, transpose=True)  # (wp, kp)
        basis_args = tuple(jnp.asarray(m) for m in basis if m is not None)
        n_chunks = wp // twc
        grid = (b, hp // th, n_chunks)
        spec_img = pl.BlockSpec((3, 1, th, twc), lambda i, j, c: (0, i, j, c),
                                memory_space=pltpu.VMEM)
        spec_basis = pl.BlockSpec((twc, kp), lambda i, j, c: (c, 0),
                                  memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, th, kp), lambda i, j, c: (i, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, hp, kp), out_dtype)
        acc_shape = (th, kp)
        flops = nd * 2 * b * w * w * hp
        contract_sublane = False

    out = pl.pallas_call(
        _make_pass_kernel(nd, n_chunks, out_dtype, contract_sublane),
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec_img] + [spec_basis] * len(basis_args),
        out_specs=spec_out,
        scratch_shapes=(
            [] if n_chunks == 1 else [pltpu.VMEM(acc_shape, jnp.float32)]),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * b * hp * wp + out_bytes * b * h * w,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, *basis_args)
    return out[:, :h, :w]


# ---------------------------------------------------------------------------
# Epilogue: fused sparse-delta IDCT matmul + add + clip + quantize, u8->u8
# ---------------------------------------------------------------------------


def _make_epilogue_kernel():
    dn = (((1,), (0,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)

    def kernel(rgb_ref, a_ref, b_ref, out_ref):
        # b is pre-interleaved to (n, 3W) on the host (Mosaic cannot lower
        # the (TH, TW, 3) -> (TH, 3TW) lane-interleave reshape), so this one
        # dot directly yields dY in the u8 image's channel-interleaved
        # layout. 3x the skinny-matmul flops, but the stage stays
        # bandwidth-bound and needs no in-kernel layout change.
        dy3 = dot(a_ref[0], b_ref[0])                    # (TH, 3TW) f32
        # Mosaic has no direct u8 -> f32 cast; hop through int32 (exact).
        x = rgb_ref[0].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
        y = jnp.clip(x + dy3, 0.0, 1.0) * 255.0
        # f32 -> u8 likewise hops through int32.
        out_ref[0] = jnp.floor(y + 0.5).astype(jnp.int32).astype(jnp.uint8)

    return kernel


def _epilogue_plan(h: int, w: int, n: int):
    """(TH, TW, hp, np_pad) tiling for the epilogue, or None."""
    np_pad = _pad_up(n, LANE)
    for th in (1024, 512, 256, 128):
        hp = _pad_up(h, th)
        for tw in (512, 384, 256, 128):
            if w % tw:
                continue
            a = 2 * th * np_pad * 2
            bw = 2 * np_pad * 3 * tw * 2
            rgb = 2 * th * 3 * tw
            out = 2 * th * 3 * tw
            # In-kernel f32 temporaries (the dot result and the elementwise
            # chain) live on the scoped-vmem stack, ~2 tiles at once.
            temps = 2 * th * 3 * tw * 4
            if a + bw + rgb + out + temps <= _VMEM_BUDGET:
                return th, tw, hp, np_pad
    return None


def supported_epilogue(shape, dtype, n: int) -> bool:
    """True when the fused embed epilogue can handle (B, H, W, 3) u8 images
    with length-``n`` index sets: u8 input, 3W divisible into lane-aligned
    tiles, VMEM fit."""
    if len(shape) != 4 or shape[-1] != 3 or dtype != jnp.uint8:
        return False
    h, w = shape[-3], shape[-2]
    if (3 * w) % LANE or h < 8:
        return False
    if _epilogue_plan(h, w, n) is None:
        return False
    if _FORCE_INTERPRET:
        return True
    return ENABLE_EPILOGUE and _on_tpu()


def embed_epilogue(rgb: jax.Array, delta: jax.Array, idx: jax.Array,
                   *, interpret: bool | None = None) -> jax.Array:
    """u8 images + sparse coefficient delta -> watermarked u8 images, fused.

    Computes ``quantize(clip(u8/255 + IDCT(delta at idx)))`` in one kernel:
    the (H, n) x (n, W) delta-IDCT matmul runs per tile on the MXU and the
    u8 output is produced in place, so neither the f32 ``dY`` plane nor the
    f32 RGB batch ever exists in HBM (they are the two largest intermediates
    of the XLA embed epilogue). Replaces the reference's full inverse
    transform + ``into_rgb8`` (src/algorithm.rs:361-379, examples/main.rs:278).

    ``rgb``: (B, H, W, 3) u8; ``delta``: (B, n) f32 coefficient changes;
    ``idx``: (B, n) int32 flat row-major coefficient indices.
    """
    if interpret is None:
        interpret = not _on_tpu()
    b, h, w = rgb.shape[0], rgb.shape[1], rgb.shape[2]
    n = delta.shape[-1]
    th, tw, hp, np_pad = _epilogue_plan(h, w, n)

    # Factor the sparse delta-IDCT (models/pipeline._sparse_idct_delta):
    #   dY = (4/(W*H)) * D_h[:, rows] * delta @ D_w[:, cols]^T
    # a: (B, HP, NP) bf16 carries the delta + global scale; bw: (B, NP, WP).
    dh = jnp.asarray(dct.dct3_basis(h))
    dw = jnp.asarray(dct.dct3_basis(w))
    rows = idx // w
    cols = idx % w
    a = jnp.moveaxis(jnp.take(dh, rows, axis=1), 0, 1)       # (B, H, n)
    a = a * (delta * (4.0 / (w * h)))[..., None, :]
    bw = jnp.moveaxis(jnp.take(dw, cols, axis=1), 0, 1)      # (B, W, n)
    bw = jnp.swapaxes(bw, -1, -2)                            # (B, n, W)
    # Interleave the width factor to the u8 channel layout: b3[:, :, 3j+c]
    # = bw[:, :, j], so the kernel's dot emits dY already interleaved.
    bw3 = jnp.broadcast_to(bw[..., None], bw.shape + (3,)).reshape(b, n, 3 * w)
    a = jnp.pad(a.astype(jnp.bfloat16),
                ((0, 0), (0, hp - h), (0, np_pad - n)))
    bw3 = jnp.pad(bw3.astype(jnp.bfloat16), ((0, 0), (0, np_pad - n), (0, 0)))

    rgbv = rgb.reshape(b, h, 3 * w)  # free view: interleaved channels

    out = pl.pallas_call(
        _make_epilogue_kernel(),
        out_shape=jax.ShapeDtypeStruct((b, h, 3 * w), jnp.uint8),
        grid=(b, hp // th, w // tw),
        in_specs=[
            pl.BlockSpec((1, th, 3 * tw), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, th, np_pad), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, np_pad, 3 * tw), lambda i, j, k: (i, 0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, th, 3 * tw), lambda i, j, k: (i, j, k),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * np_pad * 3 * w,
            bytes_accessed=(2 * 3 * b * h * w
                            + 2 * b * (hp * np_pad + np_pad * 3 * w)),
            transcendentals=0,
        ),
        interpret=interpret,
    )(rgbv, a, bw3)
    return out.reshape(b, h, w, 3)
