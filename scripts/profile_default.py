#!/usr/bin/env python
"""Stage-level timing of the DEFAULT-tier (headline) pipelines on the chip.

Same carry-chained lax.scan methodology as bench.py; us/img at batch 32,
1080p. Run to find where the 1080p embed+extract budget goes.
"""

import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spread_spectrum_watermarking_tpu.config import (Precision, ReadConfig,
                                                     WriteConfig)
from spread_spectrum_watermarking_tpu.models import pipeline
from spread_spectrum_watermarking_tpu.ops import colorspace, dct, ranking

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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
        return base, derived ^ flip
    report("extract (full, u8)", timed_scan(extract_step, (images, marked)))

    # --- stages ---
    def half_pass(imgs):
        y = colorspace.rgb_to_luma(colorspace.u8_to_f32(imgs))
        return dct.dct2_pass(y.astype(jnp.bfloat16), axis=-2,
                             precision=Precision.DEFAULT,
                             out_dtype=jnp.bfloat16)

    t_half = jax.jit(half_pass)(images)

    def hp_step(c):
        t = half_pass(c[0])
        return c[0] ^ (t[0, 0, 0].astype(jnp.float32) * 1e30).astype(jnp.uint8), c[1]
    report("luma + H-pass (bf16)", timed_scan(hp_step, (images, t_half)))

    def rank_pass(t):
        return dct.dct2_pass(t, axis=-1, precision=Precision.DEFAULT,
                             out_dtype=jnp.bfloat16)

    def rp_step(t):
        r = rank_pass(t)
        return t * (1.0 + r[0, 0, 0].astype(jnp.bfloat16) * 1e-35)
    report("rank plane (bf16 W-pass)", timed_scan(rp_step, t_half))

    rank_plane = jax.jit(rank_pass)(t_half)

    def topk_step(r):
        idx, vals = ranking.approx_top_indices(r, N, wcfg.ordering)
        return r * (1.0 + idx[0, 0].astype(r.dtype) * 1e-35)
    report("approx rank + values", timed_scan(topk_step, rank_plane))

    idx0, vals0 = jax.jit(lambda r: ranking.approx_top_indices(
        r, N, wcfg.ordering))(rank_plane)

    delta0 = jnp.asarray(rng.standard_normal((BATCH, N)).astype(np.float32))

    def dy_epi_step(c):
        imgs, delta, idx = c
        dy = pipeline._sparse_idct_delta(delta, idx, H, W, Precision.DEFAULT)
        out = colorspace.f32_to_u8(
            jnp.clip(colorspace.u8_to_f32(imgs) + dy[..., None], 0.0, 1.0))
        return out, delta, idx
    report("dy matmul + epilogue (u8->u8)", timed_scan(
        dy_epi_step, (images, delta0, idx0)))

    # extract tail: luma_diff + bf16 pass + gather-dot
    def tail_step(c):
        base, derived, idx = c
        ydiff = colorspace.luma_diff(base, derived)
        td = dct.dct2_pass(ydiff.astype(jnp.bfloat16), axis=-2,
                           precision=Precision.DEFAULT, out_dtype=jnp.bfloat16)
        num = dct.dct2_dot_at(td, idx, contracted_axis=-2,
                              precision=Precision.DEFAULT)
        flip = (num[0, 0] * 1e-30).astype(jnp.uint8)
        return base, derived ^ flip, idx
    report("extract tail (diff pass + gather-dot)", timed_scan(
        tail_step, (images, marked, idx0)))


if __name__ == "__main__":
    main()
