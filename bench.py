#!/usr/bin/env python
"""Driver benchmark entry point: prints ONE JSON line with the headline metric.

Headline: 1080p embed+extract images/sec on one chip, vs the BASELINE.json
north-star target of 1000 1080p embeds/sec/chip.
"""

import json
import sys


def main() -> int:
    from spread_spectrum_watermarking_tpu.bench import run_bench

    # DEFAULT is the production tier: single-pass bf16 transforms whose
    # rounding cancels out of detection by construction (the delta-exact
    # fast path, models/pipeline.py); quality at this tier is pinned by
    # tests/test_precision_gate.py (self-sim, null-hypothesis, resize and
    # crop attacks all at reference-grade sigma).
    # Batch 48 measured ~2% faster than 32 (1782 vs 1747 img/s; 64 is equal
    # to 48 but compiles longer).
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    res = run_bench(batch=batch, size="1080p", length=1000, iters=64,
                    precision="default", quiet=True)
    value = res["embed_extract_images_per_sec"]
    print(json.dumps({
        "metric": "1080p_embed_extract_images_per_sec_chip",
        "value": round(value, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(value / 1000.0, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
