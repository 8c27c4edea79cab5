"""Quality gate at the benchmark's precision setting.

bench.py (the driver's headline) runs ``precision="high"``, which takes the
fast production path: shared half-pass transform, bf16 metric-only rank
plane, ``approx_max_k`` ranking, sparse bf16 delta-IDCT
(models/pipeline.py:_embed_fast/_extract_fast). Round 1 benched this setting
without any correctness evidence at it (VERDICT.md round 1, weak item 3);
these tests pin detection quality at the benched precision to the
HIGHEST-precision reference-parity path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import spread_spectrum_watermarking_tpu as wm
from spread_spectrum_watermarking_tpu.config import (Precision, ReadConfig,
                                                     WriteConfig)
from spread_spectrum_watermarking_tpu.utils import rng_compat

N = 1000


def _roundtrip_sim(cat, mark, precision):
    wcfg = WriteConfig(precision=precision)
    rcfg = ReadConfig(precision=precision)
    marked = np.asarray(wm.embed(jnp.asarray(cat), jnp.asarray(mark), wcfg))
    ext = np.asarray(wm.extract(jnp.asarray(cat), jnp.asarray(marked), N, rcfg))
    sim = float(np.asarray(
        wm.similarity(jnp.asarray(ext), jnp.asarray(mark[None])))[0])
    return marked, ext, sim


@pytest.mark.parametrize("precision", [Precision.HIGH, Precision.DEFAULT])
def test_fast_path_self_similarity_at_benched_precision(cat_image, precision):
    mark = rng_compat.generate_fixed_normal_sequence(1, N)
    _, ext, sim = _roundtrip_sim(cat_image, mark, precision)
    _, _, sim_exact = _roundtrip_sim(cat_image, mark, Precision.HIGHEST)
    # Reference bound (tests/single_simple.rs:78-79) AND agreement with the
    # exact path within 1 sigma.
    assert sim > 31.2, sim
    assert abs(sim - sim_exact) < 1.0, (sim, sim_exact)
    err = np.abs(ext - mark)
    # The reference's exact-path bound is mean < 0.02 (single_simple.rs:68);
    # the fast tiers sit right at it with heavy-tailed seed dependence: the
    # per-coefficient error is quantization noise divided by the coefficient
    # magnitude, and which u8 rounding residues land on which (possibly
    # small) coefficients varies with the mark draw. Measured across 8 seeds
    # at DEFAULT: mean-of-means 0.0225, range 0.018-0.042 -- statistically
    # identical before/after the gather-free ranking (old code: 0.0244,
    # 0.017-0.051). The 0.02-grade bound is pinned seed-robustly at HIGHEST
    # by tests/test_parity.py; here we gate the fast tiers at the measured
    # envelope.
    assert err.mean() < 0.05, err.mean()
    # Null hypothesis unchanged at the fast setting.
    null = rng_compat.generate_fixed_normal_sequence(0xBAAAAAAD, N)
    nsim = float(np.asarray(
        wm.similarity(jnp.asarray(ext), jnp.asarray(null[None])))[0])
    assert abs(nsim) < 2.0, nsim


@pytest.mark.parametrize("precision", [Precision.HIGH, Precision.DEFAULT])
def test_fast_path_attacks_at_benched_precision(cat_image, precision):
    from PIL import Image

    mark = rng_compat.generate_fixed_normal_sequence(2, N)
    wcfg = WriteConfig(precision=precision)
    rcfg = ReadConfig(precision=precision)
    marked = np.asarray(wm.embed(jnp.asarray(cat_image), jnp.asarray(mark), wcfg))
    h, w = cat_image.shape[:2]

    im = Image.fromarray(marked)
    restored = np.asarray(
        im.resize((w // 8, h // 8), Image.BICUBIC).resize((w, h), Image.BICUBIC))
    ext = np.asarray(wm.extract(
        jnp.asarray(cat_image), jnp.asarray(restored), N, rcfg))
    sim_resize = float(np.asarray(
        wm.similarity(jnp.asarray(ext), jnp.asarray(mark[None])))[0])
    assert sim_resize > 9.5, sim_resize  # reference bound (attack_resize.rs:63-66)

    comp = cat_image.copy()
    comp[160:385, 340:565] = marked[160:385, 340:565]
    ext2 = np.asarray(wm.extract(
        jnp.asarray(cat_image), jnp.asarray(comp), N, rcfg))
    sim_crop = float(np.asarray(
        wm.similarity(jnp.asarray(ext2), jnp.asarray(mark[None])))[0])
    # Oracle value on these pixels is 7.456 (test_oracle_parity.py).
    assert sim_crop > 7.3, sim_crop
