#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line with the headline metric.

Headline: 1080p embed+extract images/sec on one chip, vs the BASELINE.json
north-star target of 1000 1080p embeds/sec/chip.

The headline loop runs the full embed -> u8 quantize -> extract cycle as ONE
XLA program (models/pipeline.embed_verified): the base image's forward
transform + ranking are computed once and shared between the write and read
sides -- a bit-identical reuse (a Reader re-deriving them from the same base
at the same tier produces the same values;
tests/test_pipeline.py::test_embed_verified_matches_separate_calls pins the
equivalence against separate embed()+extract() calls). Round-5 measured the
fused program at 3262 img/s vs 2334 for the separate-programs loop on the
same chip in the same session (slope-timed -- see _timed_scan); the
separate-programs numbers remain in README's table.
"""

import json
import sys


def main() -> int:
    from spread_spectrum_watermarking_tpu.bench import run_verified_bench

    # DEFAULT is the production tier: single-pass bf16 transforms whose
    # rounding cancels out of detection by construction (the delta-exact
    # fast path, models/pipeline.py); quality at this tier is pinned by
    # tests/test_precision_gate.py (self-sim, null-hypothesis, resize and
    # crop attacks all at reference-grade sigma, plus the paired 8-seed
    # fast-vs-HIGHEST gate). Batch 48: 96 measured equal (round-5 campaign),
    # 32 ~2% slower.
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    res = run_verified_bench(batch=batch, size="1080p", length=1000, iters=64,
                             precision="default")
    value = res["embed_verified_images_per_sec"]
    print(json.dumps({
        "metric": "1080p_embed_extract_images_per_sec_chip",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / 1000.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
