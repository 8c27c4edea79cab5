"""Smoke + A/B the fused kernels on the real TPU chip.

Usage: python scripts/tpu_kernel_smoke.py [prologue|epilogue|all]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from spread_spectrum_watermarking_tpu.config import Precision
from spread_spectrum_watermarking_tpu.models import pipeline
from spread_spectrum_watermarking_tpu.ops import colorspace, dct, fused_dct

what = sys.argv[1] if len(sys.argv) > 1 else "all"
print("devices:", jax.devices(), flush=True)


def timeit(f, *args, iters=50):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def rand_rgb(b, h, w, seed=0):
    rng = np.random.default_rng(seed)
    return jax.device_put(rng.integers(0, 256, (b, h, w, 3), dtype=np.uint8))


def check_prologue(b, h, w, prec, tag):
    rgb = rand_rgb(b, h, w)
    k = jax.jit(lambda x: fused_dct.luma_pass(x, prec, out_dtype=jnp.bfloat16))

    ax = -2 if h <= w else -1

    @jax.jit
    def xla(x):
        y = colorspace.rgb_to_luma(x.astype(jnp.float32) / 255.0)
        if prec is Precision.DEFAULT:
            return dct.dct2_pass(y.astype(jnp.bfloat16), axis=ax,
                                 precision=Precision.DEFAULT,
                                 out_dtype=jnp.bfloat16)
        return dct.dct2_pass(y, axis=ax, precision=prec).astype(jnp.bfloat16)

    got = np.asarray(k(rgb), np.float32)
    ref = np.asarray(xla(rgb), np.float32)
    scale = np.abs(ref).max()
    err = np.abs(got - ref).max() / scale
    tk = timeit(k, rgb)
    tx = timeit(xla, rgb)
    print(f"[prologue {tag}] relerr={err:.2e}  kernel={tk*1e6/b:.1f}us/img  "
          f"xla={tx*1e6/b:.1f}us/img", flush=True)


if what in ("prologue", "all"):
    check_prologue(8, 1080, 1920, Precision.HIGH, "1080p HIGH resident")
    check_prologue(8, 1080, 1920, Precision.DEFAULT, "1080p DEFAULT resident")
    check_prologue(2, 2160, 3840, Precision.DEFAULT, "4K DEFAULT resident")
    check_prologue(8, 1920, 1080, Precision.HIGH, "portrait 1080p HIGH")
print("done", flush=True)
