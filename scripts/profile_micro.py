#!/usr/bin/env python
"""Micro-benchmarks of the ranking and sparse-read sub-ops at DEFAULT tier."""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spread_spectrum_watermarking_tpu.ops import dct

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
    print(f"{name:48s} {1e6 * dt / BATCH:9.1f} us/img", flush=True)


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(
        rng.standard_normal((BATCH, H, W)).astype(np.float32)).astype(jnp.bfloat16)
    flat = plane.reshape(BATCH, H * W)
    idx0 = jnp.asarray(
        np.stack([rng.choice(H * W, N, replace=False) for _ in range(BATCH)])
        .astype(np.int32))

    # 1. approx_max_k alone over bf16 squared keys
    def amk(p):
        keys = (p * p).reshape(BATCH, -1)
        _, idx = jax.lax.approx_max_k(keys, N)
        return p * (1 + idx[0, 0].astype(p.dtype) * jnp.bfloat16(1e-30))
    report("approx_max_k (bf16 v*v keys, 2.07M)", timed_scan(amk, plane))

    # 2. flat element gather of n random positions
    def gat(c):
        f, idx = c
        v = jnp.take_along_axis(f, idx, axis=-1).astype(jnp.float32)
        return f * (1 + v[0, 0].astype(f.dtype) * jnp.bfloat16(1e-30)), idx
    report("flat gather n=1000", timed_scan(gat, (flat, idx0)))

    # 3. resort of 1000 candidates (3-operand lax.sort)
    cand = jnp.take_along_axis(flat, idx0, axis=-1).astype(jnp.float32)
    def srt(c):
        cm, idx, cv = c
        _, si, sv = jax.lax.sort((-cm, idx, cv), num_keys=2, dimension=-1)
        return cm * (1 + sv[0, 0] * 1e-30), idx, cv
    report("3-operand resort n=1000", timed_scan(srt, (cand * cand, idx0, cand)))

    # 4. row gather (n, W) from the plane  (extract's dct2_dot_at pattern)
    def rg(c):
        p, idx = c
        rows = idx // W
        g = jnp.take_along_axis(p, rows[..., :, None], axis=-2)
        return p * (1 + g[0, 0, 0] * jnp.bfloat16(1e-30)), idx
    report("row gather (n,W) from plane", timed_scan(rg, (plane, idx0)))

    # 5. full gather-dot (dct2_dot_at)
    def gd(c):
        p, idx = c
        v = dct.dct2_dot_at(p, idx, contracted_axis=-2,
                            precision=__import__(
                                "spread_spectrum_watermarking_tpu.config",
                                fromlist=["Precision"]).Precision.DEFAULT)
        return p * (1 + v[0, 0].astype(jnp.bfloat16) * jnp.bfloat16(1e-30)), idx
    report("dct2_dot_at (gather + einsum)", timed_scan(gd, (plane, idx0)))

    # 6. full second pass (for comparison): bf16 dot over W
    cw = jnp.asarray(dct.dct2_basis(W)).astype(jnp.bfloat16)
    def fp(p):
        out = jax.lax.dot_general(
            p, cw, ((( -1 + 3,), (1,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        return p * (1 + out[0, 0, 0] * jnp.bfloat16(1e-30))
    report("full W-pass dot (2.07M x 1920)", timed_scan(fp, plane))

    # 7. basis-row gather (n, W) from (W, W) basis
    cwf = jnp.asarray(dct.dct2_basis(W)).astype(jnp.bfloat16)
    def bg(c):
        idx, = c
        cols = idx % W
        cg = cwf[cols]
        return (idx + (cg[0, 0, 0] * jnp.bfloat16(1e-30)).astype(jnp.int32),)
    report("basis row gather (n,W)", timed_scan(bg, (idx0,)))


if __name__ == "__main__":
    main()
