"""Throughput benchmark harness.

Measures embed / extract / embed+extract images-per-second on the current
default device (one TPU chip under the driver). The reference publishes no
throughput numbers (SURVEY.md section 6); the target is BASELINE.json's
north star: >= 1000 1080p embeds/sec/chip.

Prints one JSON line per metric; the repo-root ``bench.py`` wraps this and
prints the single headline line the driver records.
"""

from __future__ import annotations

import json
import time
from typing import Tuple

import numpy as np

from .config import Precision, ReadConfig, WriteConfig


_SIZES = {
    "1080p": (1080, 1920),
    "720p": (720, 1280),
    "4k": (2160, 3840),
    "cat": (444, 640),
}


def parse_size(size: str) -> Tuple[int, int]:
    if size.lower() in _SIZES:
        return _SIZES[size.lower()]
    h, w = size.lower().split("x")
    return int(h), int(w)


def _time_fn(fn, iters: int) -> float:
    import jax

    fn()  # warmup / compile
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def run_bench(batch: int = 32, size: str = "1080p", length: int = 1000,
              iters: int = 10, precision: str = "high",
              quiet: bool = False) -> dict:
    import jax
    import jax.numpy as jnp

    from . import embed, extract_prepared, generate_normal, prepare_base, prepare_derived

    h, w = parse_size(size)
    prec = Precision(precision)
    wcfg = WriteConfig(precision=prec)
    rcfg = ReadConfig(precision=prec)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8))
    marks = generate_normal(jax.random.PRNGKey(0), length, count=batch)[:, None, :]
    marks = jax.block_until_ready(marks)

    t_embed = _time_fn(lambda: embed(images, marks, wcfg), iters)

    marked = jax.block_until_ready(embed(images, marks, wcfg))

    def do_extract():
        flat, idx = prepare_base(images, length, rcfg)
        dflat = prepare_derived(marked, rcfg)
        return extract_prepared(flat, idx, dflat, rcfg)

    t_extract = _time_fn(do_extract, iters)

    embeds_per_sec = batch / t_embed
    extracts_per_sec = batch / t_extract
    combined_per_sec = batch / (t_embed + t_extract)

    results = {
        "size": f"{h}x{w}",
        "batch": batch,
        "length": length,
        "precision": prec.value,
        "embed_images_per_sec": embeds_per_sec,
        "extract_images_per_sec": extracts_per_sec,
        "embed_extract_images_per_sec": combined_per_sec,
        "embed_ms_per_image": 1e3 * t_embed / batch,
        "extract_ms_per_image": 1e3 * t_extract / batch,
        "device": str(jax.devices()[0]),
    }
    if not quiet:
        for k in ("embed_images_per_sec", "extract_images_per_sec",
                  "embed_extract_images_per_sec"):
            print(json.dumps({
                "metric": f"{size}_{k}", "value": round(results[k], 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(results[k] / 1000.0, 4),
            }))
    return results


def run_similarity_sweep_bench(n_extracted: int = 1024, n_marks: int = 10000,
                               length: int = 1000, iters: int = 10) -> dict:
    """The 10k-watermark similarity sweep (BASELINE.json config 4): one matmul."""
    import jax
    import jax.numpy as jnp

    from . import similarity

    rng = np.random.default_rng(1)
    ext = jnp.asarray(rng.standard_normal((n_extracted, length)), dtype=jnp.float32)
    marks = jnp.asarray(rng.standard_normal((n_marks, length)), dtype=jnp.float32)
    t = _time_fn(lambda: similarity(ext, marks), iters)
    pairs_per_sec = n_extracted * n_marks / t
    return {"similarity_pairs_per_sec": pairs_per_sec, "seconds": t}
