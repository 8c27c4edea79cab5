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


# ---------------------------------------------------------------------------
# Codec module (native/ssw_codec.cpp: libjpeg + libpng)
# ---------------------------------------------------------------------------

codec = pytest.importorskip(
    "spread_spectrum_watermarking_tpu.utils._codec",
    reason="native codec extension not built")


def test_native_decode_is_pil_identical():
    # Decode must be byte-identical to the PIL path on the repo's reference
    # assets (same libjpeg, JDCT_ISLOW; PNG alpha-strip like convert("RGB")):
    # the framework's numerics contract starts at decoded pixels
    # (reference: image crate decode, SURVEY.md layer 0), so the two hosts
    # paths may not disagree by even one code.
    from PIL import Image

    for path in ("/root/reference/tests/porcelain_cat_grey_background.jpg",
                 "/root/reference/tests/watermarked_with_1.png"):
        with open(path, "rb") as f:
            ours = codec.decode_rgb_u8(f.read())
        pil = np.asarray(Image.open(path).convert("RGB"))
        np.testing.assert_array_equal(ours, pil)


def test_native_png_encode_lossless_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, (37, 61, 3), dtype=np.uint8)
    png = codec.encode_png(arr)
    import io

    from PIL import Image

    back = np.asarray(Image.open(io.BytesIO(png)).convert("RGB"))
    np.testing.assert_array_equal(back, arr)
    # and through the image_io save/load path (native encode + native decode)
    from spread_spectrum_watermarking_tpu.utils import image_io

    p = tmp_path / "x.png"
    image_io.save_rgb(p, arr)
    np.testing.assert_array_equal(image_io.load_rgb_u8(p), arr)


def test_native_decode_rejects_unknown_and_falls_back():
    with pytest.raises(ValueError):
        codec.decode_rgb_u8(b"not an image at all")
    # image_io falls back to PIL for formats the codec rejects (BMP here).
    import io

    from PIL import Image

    from spread_spectrum_watermarking_tpu.utils import image_io

    arr = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.bmp")
        Image.fromarray(arr, mode="RGB").save(p)
        np.testing.assert_array_equal(image_io.load_rgb_u8(p), arr)


def test_native_png_guard_16bit_and_gamma_fall_back_to_pil(tmp_path):
    # libpng's simplified API would happily decode 16-bit and gAMA/iCCP PNGs
    # -- but with 16-to-8 scaling / gamma conversion PIL does not apply,
    # silently breaking the byte-parity contract. The codec must REJECT such
    # files (ValueError) so image_io.load_rgb_u8 falls back to PIL
    # (ADVICE r4 low item).
    import io

    from PIL import Image

    from spread_spectrum_watermarking_tpu.utils import image_io

    # 16-bit grayscale PNG.
    deep = (np.arange(32 * 32, dtype=np.uint16).reshape(32, 32) * 17) % 65535
    buf = io.BytesIO()
    Image.fromarray(deep).save(buf, format="PNG")  # mode I;16 inferred
    with pytest.raises(ValueError, match="16-bit"):
        codec.decode_rgb_u8(buf.getvalue())

    # 8-bit RGB PNG with a decidedly non-sRGB gAMA chunk (spliced in after
    # IHDR with a valid CRC -- PIL ignores gAMA on read, libpng would not).
    import struct
    import zlib

    rng = np.random.default_rng(9)
    arr = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr, mode="RGB").save(buf, format="PNG")
    plain_png = buf.getvalue()
    gama_body = b"gAMA" + struct.pack(">I", 25000)  # gamma 0.25
    gama = (struct.pack(">I", 4) + gama_body
            + struct.pack(">I", zlib.crc32(gama_body)))
    ihdr_end = 8 + 4 + 4 + 13 + 4  # sig + len + "IHDR" + data + crc
    data = plain_png[:ihdr_end] + gama + plain_png[ihdr_end:]
    p = tmp_path / "gamma.png"
    p.write_bytes(data)
    assert b"gAMA" in data
    with pytest.raises(ValueError, match="gAMA"):
        codec.decode_rgb_u8(data)
    # The public loader still reads both, PIL-identically.
    np.testing.assert_array_equal(
        image_io.load_rgb_u8(p), np.asarray(Image.open(p).convert("RGB")))
    # ...and a plain 8-bit PNG still takes the native path untouched.
    plain = codec.encode_png(arr)
    np.testing.assert_array_equal(codec.decode_rgb_u8(plain), arr)


def test_vendored_codec_matches_fresh_build(tmp_path):
    """Same reproducibility requirement as the RNG module: the vendored
    codec .so must match a fresh build of native/ssw_codec.cpp."""
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
        tmp_path / "spread_spectrum_watermarking_tpu" / "utils" / "_codec_impl*.so"))
    assert built, "build produced no codec extension"
    spec = importlib.util.spec_from_file_location("_codec_impl", built[0])
    fresh = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(fresh)
    from spread_spectrum_watermarking_tpu.utils import _codec_impl as vendored

    with open("/root/reference/tests/porcelain_cat_grey_background.jpg", "rb") as f:
        data = f.read()
    assert fresh.decode_rgb_bytes(data) == vendored.decode_rgb_bytes(data)
    rgb, h, w = vendored.decode_rgb_bytes(data)
    assert fresh.encode_png_bytes(rgb, h, w) == vendored.encode_png_bytes(rgb, h, w)
