#!/usr/bin/env python
"""Capture XProf traces of the round-5 headline loop and the batch-1 path.

Writes two trace dirs (headline: the fused embed_verified scan at batch 48;
latency: the batch-1 embed scan), then prints the hot-op tables via
scripts/xprof_report.py's machinery. Run from /root/repo on the live chip.
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from spread_spectrum_watermarking_tpu.config import WriteConfig, Precision
from spread_spectrum_watermarking_tpu.models import pipeline

OUT = "/tmp/ssw_trace_r5"


def scan_loop(step, carry, n):
    @functools.partial(jax.jit, static_argnames=("k",))
    def loop(c, k):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c, None, length=k)
        return c
    return loop(carry, n)


def main():
    rng = np.random.default_rng(0)
    wcfg = WriteConfig(precision=Precision.DEFAULT)
    marks48 = jnp.asarray(rng.standard_normal((48, 1, 1000)).astype(np.float32))
    imgs48 = jnp.asarray(
        rng.integers(0, 256, (48, 1080, 1920, 3), dtype=np.uint8))

    def verified_step(imgs):
        marked, ext = pipeline.embed_verified(imgs, marks48, wcfg)
        flip = (ext[0, 0] * 1e-30).astype(jnp.uint8)
        return marked.at[0, 0, 0, 0].set(marked[0, 0, 0, 0] ^ flip)

    # warm/compile outside the trace
    jax.block_until_ready(scan_loop(verified_step, imgs48, 8))
    with jax.profiler.trace(f"{OUT}/headline"):
        t0 = time.perf_counter()
        jax.block_until_ready(scan_loop(verified_step, imgs48, 16))
        dt = time.perf_counter() - t0
    print(f"headline traced: {16 * 48 / dt:.1f} img/s", flush=True)

    marks1 = marks48[:1]
    imgs1 = imgs48[:1]

    def embed1_step(imgs):
        out = pipeline.embed(imgs, marks1, wcfg)
        return out

    jax.block_until_ready(scan_loop(embed1_step, imgs1, 8))
    with jax.profiler.trace(f"{OUT}/latency"):
        t0 = time.perf_counter()
        jax.block_until_ready(scan_loop(embed1_step, imgs1, 64))
        dt = time.perf_counter() - t0
    print(f"batch-1 embed traced: {1e3 * dt / 64:.3f} ms/img", flush=True)

    for which in ("headline", "latency"):
        print(f"\n===== hot ops: {which} =====", flush=True)
        subprocess.run([sys.executable,
                        os.path.join(os.path.dirname(__file__),
                                     "xprof_report.py"),
                       f"{OUT}/{which}", "22"], check=False)


if __name__ == "__main__":
    main()
