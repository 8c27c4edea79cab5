#!/usr/bin/env python
"""Micro-benchmarks for the ranking stage on the live chip.

approx_max_k measured ~108 us/img at (32, 1080*1920) -- far off the ~5 us
HBM-stream bound. Compare against two-stage variants.
"""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

B, H, W, N = 32, 1080, 1920, 1000
SIZE = H * W


def timed_scan(step_fn, carry, iters=64):
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
    print(f"{name:50s} {1e6 * dt / B:9.1f} us/img")


def main():
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(B, SIZE)).astype(np.float32))
    plane_bf = plane.astype(jnp.bfloat16)

    def chain(x, idx):
        return x * (1.0 + idx[..., 0:1].astype(x.dtype) * 1e-35)

    # (a) plain approx_max_k on bf16 metric
    def a(x):
        m = (x * x).astype(jnp.bfloat16)
        _, idx = jax.lax.approx_max_k(m, N)
        return chain(x, idx)
    report("a: metric + approx_max_k(2M, k=1000)", timed_scan(a, plane))

    # (a2) approx_max_k on f32 metric
    def a2(x):
        m = x * x
        _, idx = jax.lax.approx_max_k(m, N)
        return chain(x, idx)
    report("a2: metric f32 + approx_max_k", timed_scan(a2, plane))

    # (a3) approx_max_k with lower recall target
    def a3(x):
        m = (x * x).astype(jnp.bfloat16)
        _, idx = jax.lax.approx_max_k(m, N, recall_target=0.8)
        return chain(x, idx)
    report("a3: approx_max_k recall=0.8", timed_scan(a3, plane))

    # (b) tile-max 32 then approx_max_k over maxes, gather+exact-sort tiles
    def b(x, tile=32):
        m = (x * x).astype(jnp.bfloat16)
        t = SIZE // tile
        tiles = m.reshape(B, t, tile)
        maxes = tiles.max(axis=-1)
        _, tids = jax.lax.approx_max_k(maxes, N)
        cand = jnp.take_along_axis(tiles, tids[..., None], axis=-2)
        offs = jnp.arange(tile, dtype=jnp.int32)
        ci = (tids[..., None] * tile + offs).reshape(B, N * tile)
        cv = cand.reshape(B, N * tile).astype(jnp.float32)
        _, sidx = jax.lax.sort((-cv, ci), num_keys=2, dimension=-1)
        return chain(x, sidx[..., :N])
    report("b: tilemax32 + approx + exact-sort 32k", timed_scan(b, plane))

    # (c) tile-max 32 + approx over maxes + approx over candidates
    def c(x, tile=32):
        m = (x * x).astype(jnp.bfloat16)
        t = SIZE // tile
        tiles = m.reshape(B, t, tile)
        maxes = tiles.max(axis=-1)
        _, tids = jax.lax.approx_max_k(maxes, N)
        cand = jnp.take_along_axis(tiles, tids[..., None], axis=-2)
        offs = jnp.arange(tile, dtype=jnp.int32)
        ci = (tids[..., None] * tile + offs).reshape(B, N * tile)
        cv = cand.reshape(B, N * tile)
        _, pos = jax.lax.approx_max_k(cv, N)
        idx = jnp.take_along_axis(ci, pos, axis=-1)
        return chain(x, idx)
    report("c: tilemax32 + approx + approx(32k)", timed_scan(c, plane))

    # (d) top_k (exact) over tile maxes, then exact sort
    def d(x, tile=32):
        m = (x * x).astype(jnp.bfloat16)
        t = SIZE // tile
        tiles = m.reshape(B, t, tile)
        maxes = tiles.max(axis=-1)
        _, tids = jax.lax.top_k(maxes, N)
        cand = jnp.take_along_axis(tiles, tids[..., None], axis=-2)
        offs = jnp.arange(tile, dtype=jnp.int32)
        ci = (tids[..., None] * tile + offs).reshape(B, N * tile)
        cv = cand.reshape(B, N * tile).astype(jnp.float32)
        _, sidx = jax.lax.sort((-cv, ci), num_keys=2, dimension=-1)
        return chain(x, sidx[..., :N])
    report("d: tilemax32 + exact top_k + exact-sort", timed_scan(d, plane))

    # recall check of (c) vs exact
    m = np.asarray(plane[0] * plane[0])
    exact = np.argsort(-m, kind="stable")[:N]
    got_a = np.asarray(jax.lax.approx_max_k(
        jnp.asarray(m[None]).astype(jnp.bfloat16), N)[1])[0]
    def run_c(x):
        m = (x * x).astype(jnp.bfloat16)
        t = SIZE // 32
        tiles = m.reshape(1, t, 32)
        maxes = tiles.max(axis=-1)
        _, tids = jax.lax.approx_max_k(maxes, N)
        cand = jnp.take_along_axis(tiles, tids[..., None], axis=-2)
        offs = jnp.arange(32, dtype=jnp.int32)
        ci = (tids[..., None] * 32 + offs).reshape(1, N * 32)
        cv = cand.reshape(1, N * 32)
        _, pos = jax.lax.approx_max_k(cv, N)
        return jnp.take_along_axis(ci, pos, axis=-1)
    got_c = np.asarray(run_c(plane[0:1]))[0]
    print("recall a:", np.isin(got_a, exact).mean(),
          " recall c:", np.isin(got_c, exact).mean())


if __name__ == "__main__":
    main()
