#!/usr/bin/env python
"""Validate + measure the diag-matmul dct2_dot_at rewrite and the 1080p
DEFAULT prologue kernel."""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spread_spectrum_watermarking_tpu.config import Precision
from spread_spectrum_watermarking_tpu.ops import dct, fused_dct

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 48
H, W = 1080, 1920
N = 1000
ITERS = 32


def timed_scan(step_fn, carry, iters=ITERS):
    @functools.partial(jax.jit, static_argnames=("n",))
    def loop(c, n):
        def body(c, _):
            return step_fn(c), None
        c, _ = jax.lax.scan(body, c, None, length=n)
        return c

    def fetch(c):
        leaf = jax.tree_util.tree_leaves(c)[0]
        return float(jnp.sum(leaf[..., 0].astype(jnp.float32)))

    fetch(loop(carry, iters))
    t0 = time.perf_counter()
    fetch(loop(carry, iters))
    return (time.perf_counter() - t0) / iters


def report(name, dt):
    print(f"{name:52s} {1e6 * dt / BATCH:9.1f} us/img", flush=True)


def dot_at_diag(t, idx, contracted_axis, precision):
    """Candidate rewrite: basis column take + batched matmul + one-hot diag."""
    h, w = t.shape[-2], t.shape[-1]
    rows = idx // w
    cols = idx % w
    bdt = jnp.bfloat16 if precision is Precision.DEFAULT else jnp.float32
    if contracted_axis in (-2, t.ndim - 2):
        # t = C_h @ Y (freq rows, spatial cols); coeff = t[r, :] . C_w[c, :]
        cw_t = jnp.asarray(dct.dct2_basis(w)).T.astype(bdt)     # (W, Kw)
        db = jnp.moveaxis(jnp.take(cw_t, cols, axis=1), 0, 1)   # (B, W, n)
        x = jax.lax.dot_general(
            t.astype(bdt), db, (((t.ndim - 1,), (1,)), (tuple(range(t.ndim - 2)),
                                                        tuple(range(t.ndim - 2)))),
            preferred_element_type=jnp.float32)                  # (B, H, n)
        hh = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0)
        oh = (rows[..., None, :] == hh).astype(x.dtype)          # (B, H, n)
        return jnp.einsum("...hn,...hn->...n", x, oh,
                          preferred_element_type=jnp.float32)
    # t = Y @ C_w^T; coeff = C_h[r, :] . t[:, c]
    ch_t = jnp.asarray(dct.dct2_basis(h)).T.astype(bdt)          # (H, Kh)
    db = jnp.moveaxis(jnp.take(ch_t, rows, axis=1), 0, 1)        # (B, H, n)
    x = jax.lax.dot_general(
        jnp.swapaxes(t, -1, -2).astype(bdt), db,
        (((t.ndim - 1,), (1,)), (tuple(range(t.ndim - 2)),
                                 tuple(range(t.ndim - 2)))),
        preferred_element_type=jnp.float32)                      # (B, W, n)
    ww = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0)
    oh = (cols[..., None, :] == ww).astype(x.dtype)
    return jnp.einsum("...wn,...wn->...n", x, oh,
                      preferred_element_type=jnp.float32)


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(
        rng.standard_normal((BATCH, H, W)).astype(np.float32)).astype(jnp.bfloat16)
    idx0 = jnp.asarray(
        np.stack([rng.choice(H * W, N, replace=False) for _ in range(BATCH)])
        .astype(np.int32))

    # correctness vs existing
    old = jax.jit(lambda p, i: dct.dct2_dot_at(
        p, i, contracted_axis=-2, precision=Precision.DEFAULT))(plane, idx0)
    new = jax.jit(lambda p, i: dot_at_diag(
        p, i, -2, Precision.DEFAULT))(plane, idx0)
    err = float(jnp.max(jnp.abs(old - new)))
    rel = float(jnp.max(jnp.abs(old - new) / (jnp.abs(old) + 1e-3)))
    print(f"max abs diff old vs new: {err:.6e}  rel: {rel:.6e}", flush=True)

    def gd_old(c):
        p, idx = c
        v = dct.dct2_dot_at(p, idx, contracted_axis=-2,
                            precision=Precision.DEFAULT)
        return p * (1 + v[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)), idx
    report("dct2_dot_at OLD (row gather + einsum)", timed_scan(gd_old, (plane, idx0)))

    def gd_new(c):
        p, idx = c
        v = dot_at_diag(p, idx, -2, Precision.DEFAULT)
        return p * (1 + v[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)), idx
    report("dct2_dot_at NEW (take-matmul-diag)", timed_scan(gd_new, (plane, idx0)))

    # prologue kernel at 1080p DEFAULT vs XLA half-pass
    images = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 3), dtype=np.uint8))

    from spread_spectrum_watermarking_tpu.ops import colorspace

    def xla_half(c):
        imgs, = c
        y = colorspace.rgb_to_luma(colorspace.u8_to_f32(imgs))
        t = dct.dct2_pass(y.astype(jnp.bfloat16), axis=-2,
                          precision=Precision.DEFAULT, out_dtype=jnp.bfloat16)
        flip = (t[0, 0, 0].astype(jnp.float32) * 1e-30).astype(jnp.uint8)
        return (imgs.at[0, 0, 0, 0].set(imgs[0, 0, 0, 0] ^ flip),)
    report("XLA luma+H-pass (bf16)", timed_scan(xla_half, (images,)))

    def k_half(c):
        imgs, = c
        t = fused_dct.luma_pass(imgs, Precision.DEFAULT,
                                out_dtype=jnp.bfloat16, interpret=False)
        flip = (t[0, 0, 0].astype(jnp.float32) * 1e-30).astype(jnp.uint8)
        return (imgs.at[0, 0, 0, 0].set(imgs[0, 0, 0, 0] ^ flip),)
    report("Pallas luma+H-pass kernel (DEFAULT)", timed_scan(k_half, (images,)))

    # kernel numerics check
    t_xla = jax.jit(lambda i: dct.dct2_pass(
        colorspace.rgb_to_luma(colorspace.u8_to_f32(i)).astype(jnp.bfloat16),
        axis=-2, precision=Precision.DEFAULT, out_dtype=jnp.bfloat16))(images)
    t_k = jax.jit(lambda i: fused_dct.luma_pass(
        i, Precision.DEFAULT, out_dtype=jnp.bfloat16, interpret=False))(images)
    d = jnp.abs(t_xla.astype(jnp.float32) - t_k.astype(jnp.float32))
    scale = jnp.abs(t_xla.astype(jnp.float32)) + 1.0
    print("kernel vs XLA half-pass: max rel", float(jnp.max(d / scale)), flush=True)


if __name__ == "__main__":
    main()
