#!/usr/bin/env python
"""Epilogue formulation shootout: u8 + dY -> clip -> quantize -> u8."""

import sys
import time
import functools

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from spread_spectrum_watermarking_tpu.ops import colorspace

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 48
H, W = 1080, 1920
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


def main():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (BATCH, H, W, 3), dtype=np.uint8))
    dy = jnp.asarray((rng.standard_normal((BATCH, H, W)) * 0.003)
                     .astype(np.float32)).astype(jnp.bfloat16)

    def cur(c):
        imgs, d = c
        out = colorspace.f32_to_u8(
            jnp.clip(colorspace.u8_to_f32(imgs)
                     + d[..., None].astype(jnp.float32), 0.0, 1.0))
        return out, d
    report("current (f32 [0,1] + broadcast + clip + quant)", timed_scan(
        cur, (images, dy)))

    def intdom(c):
        imgs, d = c
        x = imgs.astype(jnp.float32)
        y = jnp.floor(x + d[..., None].astype(jnp.float32) * 255.0 + 0.5)
        out = jnp.clip(y, 0.0, 255.0).astype(jnp.uint8)
        return out, d
    report("int-domain (x + 255dy, clamp 0..255)", timed_scan(
        intdom, (images, dy)))

    dy255 = dy * jnp.bfloat16(255.0)
    def intdom_pre(c):
        imgs, d = c
        x = imgs.astype(jnp.float32)
        y = jnp.floor(x + d[..., None].astype(jnp.float32) + 0.5)
        out = jnp.clip(y, 0.0, 255.0).astype(jnp.uint8)
        return out, d
    report("int-domain, dy prescaled x255", timed_scan(
        intdom_pre, (images, dy255)))

    def perchan(c):
        imgs, d = c
        df = d.astype(jnp.float32) * 255.0
        outs = [jnp.clip(jnp.floor(imgs[..., k].astype(jnp.float32) + df + 0.5),
                         0.0, 255.0).astype(jnp.uint8) for k in range(3)]
        out = jnp.stack(outs, axis=-1)
        return out, d
    report("per-channel planar + stack", timed_scan(perchan, (images, dy)))

    # materialize dy3 = broadcast explicitly to bf16 interleaved view
    def bcast16(c):
        imgs, d = c
        d3 = jnp.broadcast_to(d[..., None], d.shape + (3,))
        x = imgs.astype(jnp.float32)
        y = jnp.floor(x + d3.astype(jnp.float32) * 255.0 + 0.5)
        out = jnp.clip(y, 0.0, 255.0).astype(jnp.uint8)
        return out, d
    report("explicit bf16 broadcast_to", timed_scan(bcast16, (images, dy)))


if __name__ == "__main__":
    main()
