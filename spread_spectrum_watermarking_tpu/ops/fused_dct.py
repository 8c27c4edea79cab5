"""Fused Pallas prologue kernel: u8 RGB -> luma -> one DCT-II pass.

Every pipeline (Writer, Reader base) begins with u8 RGB -> luma -> one 1-D
DCT-II pass (reference: src/algorithm.rs:308-342 runs RGB->YIQ then dct2_2d
row+col passes per image; src/dct2d.rs:6-7 admits the serial implementation
is unoptimised). On TPU this is a bandwidth-bound chain of elementwise
stages around one matmul; the kernel fuses the chain so the f32 luma plane
never exists in HBM.

Techniques:

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
  * **Resident-basis-only tiling**: the whole (K, H) basis stays in VMEM --
    its block index is constant, so it is DMA'd once for the entire grid
    (batch included) and needs no second pipeline buffer. Portrait images
    contract W instead of H. The reference handles any W x H serially
    (src/dct2d.rs:83-98).

Honest-A/B history (keep what wins, delete what doesn't; numbers in git
history and README):

  * The resident prologue wins where it dispatches (4K DEFAULT isolated:
    kernel 536.5 vs XLA 627.3 us/img on v5e; in-context parity within the
    measurement noise of the remote-TPU tunnel).
  * A streamed-contraction variant (basis in (K, TH) panels + VMEM scratch
    accumulator, for the non-resident 4K HIGH tier) LOST in context
    (2427 vs 2092 us/img embed, r4) and was deleted -- 4K HIGH runs the XLA
    pass.
  * An embed epilogue kernel (sparse delta-IDCT + add + clip + quantize,
    u8 -> u8) lost twice: the 3x-interleaved-width form 400.3 vs 140.5
    us/img (r3), and a channel-planar rematch -- one (TH,n)x(n,TW) dot per
    tile updating all three planes -- still lost in context at 1080p
    (embed 359.5 vs 286.3 us/img, r4: the planar u8 relayouts on both
    sides cost more than the dY HBM round trip they avoid). Deleted; the
    production epilogue is the XLA form (ops/colorspace.add_luma_delta_u8).
  * Earlier generations (even/odd "folded" row pass, whole-image 2-D
    kernel) were also A/B-measured slower in context on v5e (folded:
    194-197 us/img vs dense 137) and removed.
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

# Production dispatch flag; see models/pipeline.py for the call sites and
# BENCH history for the in-context A/B numbers on v5e.
#
# Prologue: ON, but ``supported`` additionally requires a RESIDENT basis and
# a 4K-class contraction (isolated A/B on v5e-1: 4K DEFAULT kernel 536.5 vs
# XLA 627.3 us/img; 1080p HIGH 160.6 vs 154.2 -- at 1080p the XLA pass wins
# once context fusion is counted, so the kernel only dispatches where the
# basis stays resident and the XLA operand materialization is 4K-sized).
ENABLE_PROLOGUE = True
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


def _make_pass_kernel(n_dots: int, out_dtype, contract_sublane: bool):
    """Kernel computing one full DCT pass per tile (resident basis).

    ``contract_sublane=True``: out(K, TW) = C(K, H) @ luma(H, TW)
    (the row pass, contracting H). ``False``: out(TH, K) = luma(TH, W)
    @ Ct(W, K) (the column pass, contracting W -- the portrait case).
    A streamed-contraction variant with a VMEM scratch accumulator existed
    for non-resident bases; it lost its only possible production config
    (4K HIGH) in context and was deleted -- see the module docstring.
    """
    dn = (((1,), (0,)), ((), ()))
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=dn,
                            preferred_element_type=jnp.float32)

    def body(img_ref, c_hi, c_lo, out_ref):
        y_hi, y_lo = _split(_luma_f32(img_ref), n_dots)
        if contract_sublane:
            part = dot(c_hi, y_hi)
            if n_dots == 3:
                part = part + dot(c_hi, y_lo) + dot(c_lo, y_hi)
        else:
            part = dot(y_hi, c_hi)
            if n_dots == 3:
                part = part + dot(y_lo, c_hi) + dot(y_hi, c_lo)
        out_ref[0] = part.astype(out_dtype)

    if n_dots == 3:
        def kernel(img_ref, chi_ref, clo_ref, out_ref):
            body(img_ref, chi_ref[:], clo_ref[:], out_ref)
    else:
        def kernel(img_ref, chi_ref, out_ref):
            body(img_ref, chi_ref[:], None, out_ref)
    return kernel


def _row_pass_plan(h: int, w: int, n_dots: int, out_bytes: int):
    """(TW, kp, hp, wp) tiling for the H-contraction, or None.

    Resident-only: the whole padded-H basis lives in VMEM for the entire
    grid. Returns None when it cannot fit (e.g. 4K at the 3-dot HIGH tier,
    ~19 MB of hi+lo basis) -- those configs run the XLA pass, which beat the
    deleted streamed-contraction variant in context.
    """
    kp = _pad_up(h, SUBLANE_U8)
    hp = kp
    wp = _pad_up(w, LANE)
    arrays = 2 if n_dots == 3 else 1  # hi (+ lo)
    basis = arrays * kp * hp * 2      # resident: single-buffered
    for tw in (512, 384, 256, 128):
        if wp % tw:
            continue
        img = 2 * 3 * hp * tw         # u8, double-buffered
        out = 2 * kp * tw * out_bytes
        if basis + img + out <= _VMEM_BUDGET:
            return tw, kp, hp, wp
    return None


def _col_pass_plan(h: int, w: int, n_dots: int, out_bytes: int):
    """(TH, kp, hp, wp) tiling for the W-contraction (portrait),
    resident-only as in the row plan."""
    kp = _pad_up(w, LANE)
    wp = kp
    hp = _pad_up(h, SUBLANE_U8)
    arrays = 2 if n_dots == 3 else 1
    basis = arrays * wp * kp * 2
    for th in (512, 384, 256, 128):
        if hp % th:
            continue
        img = 2 * 3 * th * wp
        out = 2 * th * kp * out_bytes
        if basis + img + out <= _VMEM_BUDGET:
            return th, kp, hp, wp
    return None


def supported(shape, dtype, precision: Precision,
              out_bytes: int = 2) -> bool:
    """True when the fused prologue kernel can run this configuration.

    Requirements: uint8 (B, H, W, 3) input, a non-HIGHEST precision (HIGHEST
    is the reference-exact f32 path), a resident-basis tiling that fits VMEM,
    and a TPU backend (or the test interpret override). ``out_bytes`` matches the
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
        # No resident-basis tiling fits VMEM (e.g. 4K HIGH): the XLA pass
        # runs instead (it beat the deleted streamed-contraction kernel).
        return False
    if _FORCE_INTERPRET:
        return True
    # Production rule (measured, see module flags): 4K-class contraction.
    return (ENABLE_PROLOGUE and _on_tpu()
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
        tw, kp, hp, wp = _row_pass_plan(h, w, nd, out_bytes)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        basis = _basis_hi_lo(h, nd, kp, hp, transpose=False)
        basis_args = tuple(jnp.asarray(m) for m in basis if m is not None)
        grid = (b, wp // tw)
        spec_img = pl.BlockSpec((3, 1, hp, tw), lambda i, j: (0, i, 0, j),
                                memory_space=pltpu.VMEM)
        spec_basis = pl.BlockSpec((kp, hp), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, kp, tw), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, kp, wp), out_dtype)
        flops = nd * 2 * b * h * h * wp
        contract_sublane = True
    else:  # contract W (column pass -- portrait)
        th, kp, hp, wp = _col_pass_plan(h, w, nd, out_bytes)
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, hp - h), (0, wp - w)))
        basis = _basis_hi_lo(w, nd, wp, kp, transpose=True)  # (wp, kp)
        basis_args = tuple(jnp.asarray(m) for m in basis if m is not None)
        grid = (b, hp // th)
        spec_img = pl.BlockSpec((3, 1, th, wp), lambda i, j: (0, i, j, 0),
                                memory_space=pltpu.VMEM)
        spec_basis = pl.BlockSpec((wp, kp), lambda i, j: (0, 0),
                                  memory_space=pltpu.VMEM)
        spec_out = pl.BlockSpec((1, th, kp), lambda i, j: (i, j, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((b, hp, kp), out_dtype)
        flops = nd * 2 * b * w * w * hp
        contract_sublane = False

    out = pl.pallas_call(
        _make_pass_kernel(nd, out_dtype, contract_sublane),
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec_img] + [spec_basis] * len(basis_args),
        out_specs=spec_out,
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=3 * b * hp * wp + out_bytes * b * h * w,
            transcendentals=0,
        ),
        interpret=interpret,
    )(planes, *basis_args)
    return out[:, :h, :w]
