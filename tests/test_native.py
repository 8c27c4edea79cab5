"""C++ native module parity tests (vs the pure-Python reference paths)."""

import numpy as np
import pytest

native = pytest.importorskip(
    "spread_spectrum_watermarking_tpu.utils._native",
    reason="native extension not built (python native/setup.py build_ext --build-lib .)")

from spread_spectrum_watermarking_tpu.ops import colorspace
from spread_spectrum_watermarking_tpu.utils import rng_compat


def test_chacha8_stream_matches_python():
    py = rng_compat.ChaChaRng.seed_from_u64(12345)
    want = np.asarray([py.next_u64() for _ in range(500)], dtype=np.uint64)
    got = native.chacha8_u64s(12345, 500)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("seed", [1, 2, 0xBAAAAAAD])
def test_normal_sequence_bit_identical_to_python(seed):
    # Force the pure-Python path for the expected values.
    rng = rng_compat.ChaChaRng.seed_from_u64(seed)
    want = np.asarray(
        [rng_compat.standard_normal_f64(rng) for _ in range(2000)],
        dtype=np.float32)
    got = native.generate_fixed_normal_sequence(seed, 2000)
    np.testing.assert_array_equal(got, want)


def test_rng_compat_dispatches_to_native():
    # The public fixture generator uses the native path when built; both paths
    # must agree, so this is mostly a smoke check of the dispatch.
    seq = rng_compat.generate_fixed_normal_sequence(7, 100)
    assert seq.dtype == np.float32 and seq.shape == (100,)


def test_quantize_matches_colorspace():
    rng = np.random.default_rng(0)
    x = (rng.standard_normal((64, 64, 3)) * 0.7 + 0.5).astype(np.float32)
    want = colorspace.np_f32_to_u8(x)
    got = native.quantize_u8(x)
    np.testing.assert_array_equal(got, want)


def test_dequantize_matches_colorspace():
    x = np.arange(256, dtype=np.uint8).reshape(16, 16)
    np.testing.assert_array_equal(
        native.dequantize_f32(x), colorspace.np_u8_to_f32(x))


def test_vendored_binary_matches_fresh_build(tmp_path):
    """The vendored .so must be reproducible from native/ssw_native.cpp
    (round-2 ADVICE: a checked-in opaque artifact is unverifiable in review
    unless a test rebuilds the source and compares outputs)."""
    import glob
    import importlib.util
    import pathlib
    import subprocess
    import sys

    root = pathlib.Path(__file__).resolve().parents[1]
    r = subprocess.run(
        [sys.executable, str(root / "native" / "setup.py"),
         "build_ext", "--build-lib", str(tmp_path)],
        capture_output=True, text=True, cwd=root)
    if r.returncode != 0:
        pytest.skip(f"no working C++ toolchain: {r.stderr[-500:]}")
    built = glob.glob(str(
        tmp_path / "spread_spectrum_watermarking_tpu" / "utils" / "_native_impl*.so"))
    assert built, "build produced no extension"
    # extension init symbol is PyInit__native_impl -- keep that name
    spec = importlib.util.spec_from_file_location("_native_impl", built[0])
    fresh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fresh)

    vendored = native._native_impl
    for seed in (1, 2, 0xBAAAAAAD):
        assert (fresh.generate_fixed_normal_sequence_bytes(seed, 1000)
                == vendored.generate_fixed_normal_sequence_bytes(seed, 1000))
        assert (fresh.chacha8_u64s_bytes(seed, 64)
                == vendored.chacha8_u64s_bytes(seed, 64))
    arr = np.linspace(-0.25, 1.25, 4096, dtype=np.float32).tobytes()
    assert fresh.quantize_u8_bytes(arr) == vendored.quantize_u8_bytes(arr)
