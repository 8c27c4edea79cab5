#!/usr/bin/env python
"""Round-5 measurement campaign: re-ground EVERY README number in ONE session.

Every config is measured with >=3 repetitions, interleaved across configs (so
slow drift hits all configs equally), in one process on the live chip. The
Pallas phase additionally A/Bs the one surviving kernel in context, k=5 per
arm, cache-cleared between arms (dispatch is a trace-time flag).

Usage: python scripts/round5_campaign.py [stable|fourk|corpus|sweep|all]
Appends one JSON line per measurement to scripts/round5_results.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

OUT = os.path.join(os.path.dirname(__file__), "round5_results.jsonl")


def emit(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def phase_stable():
    """1080p family: headline b48, b96 probe, verified, cached, latency,
    natural-content A/B. 3 interleaved reps."""
    from spread_spectrum_watermarking_tpu.bench import (
        run_bench, run_cached_extract_bench, run_latency_bench,
        run_verified_bench)

    def headline48():
        r = run_bench(batch=48, size="1080p", iters=64, precision="default",
                      quiet=True)
        return {"embed": r["embed_images_per_sec"],
                "extract": r["extract_images_per_sec"],
                "combined": r["embed_extract_images_per_sec"]}

    def headline96():
        r = run_bench(batch=96, size="1080p", iters=32, precision="default",
                      quiet=True)
        return {"embed": r["embed_images_per_sec"],
                "extract": r["extract_images_per_sec"],
                "combined": r["embed_extract_images_per_sec"]}

    def natural48():
        r = run_bench(batch=48, size="1080p", iters=64, precision="default",
                      quiet=True, content="natural")
        return {"embed": r["embed_images_per_sec"],
                "extract": r["extract_images_per_sec"],
                "combined": r["embed_extract_images_per_sec"]}

    def verified():
        r = run_verified_bench(batch=48, size="1080p", iters=64)
        return {"img_per_s": r["embed_verified_images_per_sec"]}

    def cached():
        r = run_cached_extract_bench(batch=48, size="1080p", iters=64)
        return {"img_per_s": r["cached_extract_images_per_sec"]}

    def latency1080():
        r = run_latency_bench(size="1080p", iters=256)
        return {"embed_ms": r["embed_latency_ms"],
                "extract_ms": r["extract_latency_ms"]}

    def latencycat():
        r = run_latency_bench(size="cat", iters=256)
        return {"embed_ms": r["embed_latency_ms"],
                "extract_ms": r["extract_latency_ms"]}

    configs = [("headline48", headline48), ("headline96", headline96),
               ("natural48", natural48), ("verified", verified),
               ("cached", cached), ("latency1080", latency1080),
               ("latencycat", latencycat)]
    for rep in range(3):
        for name, fn in configs:
            emit({"phase": "stable", "config": name, "rep": rep, **fn()})


def phase_fourk():
    """4K default + high, 3 interleaved reps each."""
    from spread_spectrum_watermarking_tpu.bench import run_bench

    for rep in range(3):
        for prec in ("default", "high"):
            r = run_bench(batch=8, size="4k", iters=16, precision=prec,
                          quiet=True)
            emit({"phase": "fourk", "config": f"4k-{prec}", "rep": rep,
                  "embed": r["embed_images_per_sec"],
                  "extract": r["extract_images_per_sec"],
                  "combined": r["embed_extract_images_per_sec"]})


# HISTORICAL: a phase_pallas lived here that A/B'd the resident prologue
# kernel (k=5 interleaved, cache-cleared arms). It decided the kernel's
# deletion (commit b5b6c44) and cannot run anymore -- ops/fused_dct.py is
# gone. Its raw data is scripts/round5_results_preslope.jsonl (phase
# "pallas"); the verdict is README's Pallas paragraph.


def phase_corpus():
    """End-to-end 1024-image corpus + 10k sweep, default and high tiers."""
    from spread_spectrum_watermarking_tpu.bench import run_corpus_bench

    for rep in range(2):
        for prec in ("default", "high"):
            r = run_corpus_bench(n_images=1024, chunk=64, size="1080p",
                                 precision=prec, n_marks=10000)
            emit({"phase": "corpus", "config": f"corpus-{prec}", "rep": rep,
                  "img_per_s": r["corpus_images_per_sec"],
                  "top1": r["detection_rate_top1"],
                  "own_mean": r["mean_own_mark_sigma"],
                  "own_min": r["min_own_mark_sigma"]})


def phase_sweep():
    from spread_spectrum_watermarking_tpu.bench import run_similarity_sweep_bench

    for rep in range(3):
        r = run_similarity_sweep_bench(n_extracted=1024, n_marks=10000,
                                       iters=10)
        emit({"phase": "sweep", "config": "sweep-10k", "rep": rep,
              "pairs_per_s": r["similarity_pairs_per_sec"],
              "ms": 1e3 * r["seconds"]})


PHASES = {"stable": phase_stable, "fourk": phase_fourk,
          "corpus": phase_corpus,
          "sweep": phase_sweep}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    names = list(PHASES) if which == "all" else [which]
    import jax

    emit({"phase": "meta", "device": str(jax.devices()[0]),
          "phases": names})
    for name in names:
        t0 = time.perf_counter()
        PHASES[name]()
        emit({"phase": "meta", "done": name,
              "seconds": round(time.perf_counter() - t0, 1)})


if __name__ == "__main__":
    main()
