#!/usr/bin/env python
"""Stage-level timing of the fast embed/extract pipelines on the live chip.

Times each pipeline stage with the same carry-chained lax.scan methodology as
bench.py so numbers are directly comparable (us/img at batch 32, 1080p, HIGH).
Use to find where the embed+extract budget actually goes before optimizing.
"""

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
from spread_spectrum_watermarking_tpu.ops import (colorspace, dct, modulation,
                                                  ranking)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
H, W = 1080, 1920
N = 1000
ITERS = 32
PREC = Precision.HIGH


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
    dt = (time.perf_counter() - t0) / iters
    return dt


def report(name, dt):
    print(f"{name:45s} {1e6 * dt / BATCH:9.1f} us/img  "
          f"{BATCH / dt:9.1f} img/s")


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 3), dtype=np.uint8))
    marks = jnp.asarray(rng.standard_normal((BATCH, 1, N)).astype(np.float32))
    wcfg = WriteConfig(precision=PREC)
    rcfg = ReadConfig(precision=PREC)

    # --- full pipelines ---
    report("embed (full)", timed_scan(
        lambda imgs: pipeline.embed(imgs, marks, wcfg), images))

    marked = pipeline.embed(images, marks, wcfg)
    marked_f32 = marked.astype(jnp.float32) / 255.0

    def extract_step(carry):
        base, derived = carry
        ext = pipeline.extract(base, derived, N, rcfg)
        return base, derived * (1.0 + ext[0, 0] * 1e-35)
    report("extract (full, f32 derived)", timed_scan(
        extract_step, (images, marked_f32)))

    def extract_step_u8(carry):
        base, derived = carry
        ext = pipeline.extract(base, derived, N, rcfg)
        flip = (ext[0, 0] * 1e30).astype(jnp.uint8)  # always 0 at runtime
        return base, derived ^ flip
    report("extract (full, u8 derived)", timed_scan(
        extract_step_u8, (images, marked)))

    # --- embed stages ---
    # u8 -> f32 luma -> H-pass (the shared half-pass T)
    def half_pass(imgs):
        y = colorspace.rgb_to_luma(colorspace.u8_to_f32(imgs))
        return dct.dct2_pass(y, axis=-2, precision=PREC)

    t_half = jax.jit(half_pass)(images)

    def hp_step(c):
        t = half_pass(c[0])
        return c[0] ^ (t[0, 0, 0] * 1e30).astype(jnp.uint8), c[1]
    report("luma + H-pass (T, f32, HIGH)", timed_scan(hp_step, (images, t_half)))

    # rank plane: bf16 W-pass over T
    def rank_pass(t):
        return dct.dct2_pass(t.astype(jnp.bfloat16), axis=-1,
                             precision=Precision.DEFAULT)
    def rp_step(t):
        r = rank_pass(t)
        return t * (1.0 + r[0, 0, 0].astype(jnp.float32) * 1e-35)
    report("rank plane (bf16 W-pass over T)", timed_scan(rp_step, t_half))

    # approx_max_k ranking on the metric plane
    rank_plane = jax.jit(rank_pass)(t_half)
    def topk_step(r):
        idx, _ = ranking.approx_top_indices(r.astype(jnp.float32),
                                            N, wcfg.ordering)
        return r * (1.0 + idx[0, 0].astype(r.dtype) * 1e-35)
    report("approx_max_k rank (incl. metric)", timed_scan(
        topk_step, rank_plane.astype(jnp.float32)))

    # gather-dot values at indices
    idx0 = jax.jit(lambda r: ranking.approx_top_indices(
        r, N, wcfg.ordering)[0])(jax.jit(rank_pass)(t_half))
    def vals_step(c):
        t, idx = c
        v = dct.dct2_dot_at(t, idx, contracted_axis=-2, precision=PREC)
        return t * (1.0 + v[0, 0] * 1e-35), idx
    report("gather-dot values at idx", timed_scan(vals_step, (t_half, idx0)))

    # sparse delta-IDCT (dy) alone
    delta0 = jnp.asarray(rng.standard_normal((BATCH, N)).astype(np.float32))
    def dy_step(c):
        delta, idx = c
        dy = pipeline._sparse_idct_delta(delta, idx, H, W, Precision.DEFAULT)
        return delta * (1.0 + dy[0, 0, 0] * 1e-35), idx
    report("sparse delta-IDCT (dy matmul)", timed_scan(dy_step, (delta0, idx0)))

    # epilogue alone: u8 + dy -> clip -> quantize
    dy0 = jax.jit(lambda d, i: pipeline._sparse_idct_delta(
        d, i, H, W, Precision.DEFAULT))(delta0, idx0)
    def epi_step(c):
        imgs, dy = c
        out = colorspace.f32_to_u8(
            jnp.clip(colorspace.u8_to_f32(imgs) + dy[..., None], 0.0, 1.0))
        return out, dy
    report("epilogue (u8+dy->clip->quant u8)", timed_scan(epi_step, (images, dy0)))

    # derived path: half-pass + gather-dot
    def derived_step(c):
        imgs, idx = c
        td = half_pass(imgs)
        dv = dct.dct2_dot_at(td, idx, contracted_axis=-2, precision=PREC)
        return imgs ^ (dv[0, 0] * 1e30).astype(jnp.uint8), idx
    report("derived half-pass + gather-dot (u8)", timed_scan(
        derived_step, (images, idx0)))

    # similarity sweep scale check
    ext0 = jnp.asarray(rng.standard_normal((BATCH, N)).astype(np.float32))
    def sim_step(e):
        s = modulation.similarity(e, marks[:, 0, :])
        return e * (1.0 + s[0, 0] * 1e-35)
    report("similarity (B x B)", timed_scan(sim_step, ext0))


if __name__ == "__main__":
    main()
