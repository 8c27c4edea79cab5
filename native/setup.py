"""Build the C++ native extensions in place.

Usage (from the repo root):
    python native/setup.py build_ext --build-lib .

This drops ``spread_spectrum_watermarking_tpu/utils/_native_impl*.so`` (RNG +
quantization) and, when libjpeg/libpng dev files exist, ``_codec_impl*.so``
next to the Python shims. The framework works without either (pure-Python /
PIL fallbacks).

The two extensions build in SEPARATE setup() invocations: the codec needs
libjpeg/libpng headers, and a failure there must not abort the RNG build
(ADVICE r4: one combined invocation made the stated "RNG still builds
without libjpeg/libpng" goal false).
"""

import os
import sys

from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))
script_args = sys.argv[1:] or ["build_ext", "--build-lib", "."]

setup(
    name="ssw-native",
    ext_modules=[
        Extension(
            "spread_spectrum_watermarking_tpu.utils._native_impl",
            sources=[os.path.join(here, "ssw_native.cpp")],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        ),
    ],
    script_args=script_args,
)

try:
    setup(
        name="ssw-codec",
        ext_modules=[
            Extension(
                "spread_spectrum_watermarking_tpu.utils._codec_impl",
                sources=[os.path.join(here, "ssw_codec.cpp")],
                libraries=["jpeg", "png"],
                extra_compile_args=["-O3", "-std=c++17", "-Wall"],
                language="c++",
            ),
        ],
        script_args=script_args,
    )
except (Exception, SystemExit) as e:  # noqa: BLE001 -- codec is optional
    print(f"NOTE: optional codec extension skipped (libjpeg/libpng dev "
          f"environment?): {e!r}", file=sys.stderr)
