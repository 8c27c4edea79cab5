#!/usr/bin/env python
"""Stage timing of the DEFAULT-tier production path (the headline config)."""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spread_spectrum_watermarking_tpu.config import (Precision, ReadConfig,
                                                     WriteConfig)
from spread_spectrum_watermarking_tpu.models import pipeline
from spread_spectrum_watermarking_tpu.ops import colorspace, dct, ranking

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 48
H, W = 1080, 1920
N = 1000
ITERS = 32
PREC = Precision.DEFAULT


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
    print(f"{name:45s} {1e6 * dt / BATCH:9.1f} us/img  "
          f"{BATCH / dt:9.1f} img/s", flush=True)


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 3), dtype=np.uint8))
    marks = jnp.asarray(rng.standard_normal((BATCH, 1, N)).astype(np.float32))
    wcfg = WriteConfig(precision=PREC)
    rcfg = ReadConfig(precision=PREC)

    report("embed (full)", timed_scan(
        lambda imgs: pipeline.embed(imgs, marks, wcfg), images))

    marked = pipeline.embed(images, marks, wcfg)

    def extract_step(carry):
        base, derived = carry
        ext = pipeline.extract(base, derived, N, rcfg)
        flip = (ext[0, 0] * 1e-30).astype(jnp.uint8)
        return base, derived.at[0, 0, 0, 0].set(derived[0, 0, 0, 0] ^ flip)
    report("extract (full, u8)", timed_scan(extract_step, (images, marked)))

    # --- embed stages at DEFAULT ---
    ax = -2  # H < W

    def half_pass(imgs):
        y = colorspace.rgb_to_luma(colorspace.u8_to_f32(imgs))
        return dct.dct2_pass(y.astype(jnp.bfloat16), axis=ax,
                             precision=Precision.DEFAULT,
                             out_dtype=jnp.bfloat16)

    t_half = jax.jit(half_pass)(images)

    def hp_step(c):
        t = half_pass(c[0])
        flip = (t[0, 0, 0].astype(jnp.float32) * 1e-30).astype(jnp.uint8)
        imgs = c[0].at[0, 0, 0, 0].set(c[0][0, 0, 0, 0] ^ flip)
        return imgs, c[1]
    report("luma + H-pass (bf16)", timed_scan(hp_step, (images, t_half)))

    def rank_pass(t):
        return dct.dct2_pass(t, axis=-1, precision=Precision.DEFAULT,
                             out_dtype=jnp.bfloat16)

    def rp_step(t):
        r = rank_pass(t)
        return t * (1 + r[0, 0, 0] * jnp.bfloat16(1e-30))
    report("rank plane (bf16 W-pass)", timed_scan(rp_step, t_half))

    rank_plane = jax.jit(rank_pass)(t_half)

    def topk_step(r):
        idx, vals = ranking.approx_top_indices(r, N, wcfg.ordering)
        # depend on BOTH outputs or XLA DCEs the value reconstruction
        # (the approx_max_k DCE trap -- see _timed_scan's methodology)
        dep = (idx[0, 0].astype(r.dtype)
               + vals[0, 0].astype(r.dtype)) * jnp.bfloat16(1e-30)
        return r * (1 + dep)
    report("approx rank + gather vals", timed_scan(topk_step, rank_plane))

    idx0, vals0 = jax.jit(lambda r: ranking.approx_top_indices(
        r, N, wcfg.ordering))(rank_plane)

    delta0 = jnp.asarray(rng.standard_normal((BATCH, N)).astype(np.float32))

    def dy_step(c):
        delta, idx = c
        dy = pipeline._sparse_idct_delta(delta, idx, H, W, Precision.DEFAULT)
        return delta * (1.0 + dy[0, 0, 0].astype(jnp.float32) * 1e-30), idx
    report("sparse delta-IDCT (dy)", timed_scan(dy_step, (delta0, idx0)))

    dy0 = jax.jit(lambda d, i: pipeline._sparse_idct_delta(
        d, i, H, W, Precision.DEFAULT))(delta0, idx0)

    def epi_step(c):
        imgs, dy = c
        out = colorspace.f32_to_u8(
            jnp.clip(colorspace.u8_to_f32(imgs) + dy[..., None].astype(jnp.float32), 0.0, 1.0))
        return out, dy
    report("epilogue (u8+dy->u8)", timed_scan(epi_step, (images, dy0)))

    # --- extract stages ---
    def diff_half(c):
        base, derived, idx = c
        ydiff = colorspace.luma_diff(base, derived)
        td = dct.dct2_pass(ydiff.astype(jnp.bfloat16), axis=ax,
                           precision=Precision.DEFAULT,
                           out_dtype=jnp.bfloat16)
        num = dct.dct2_dot_at(td, idx, contracted_axis=ax,
                              precision=Precision.DEFAULT)
        flip = (num[0, 0] * 1e-30).astype(jnp.uint8)
        return base, derived.at[0, 0, 0, 0].set(derived[0, 0, 0, 0] ^ flip), idx
    report("diff half-pass + gather-dot", timed_scan(
        diff_half, (images, marked, idx0)))


if __name__ == "__main__":
    main()
