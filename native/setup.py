"""Build the C++ native extensions in place.

Usage (from the repo root):
    python native/setup.py build_ext --build-lib .

This drops ``spread_spectrum_watermarking_tpu/utils/_native_impl*.so`` (RNG +
quantization) and, when libjpeg/libpng dev files exist, ``_codec_impl*.so``
next to the Python shims. The framework works without either (pure-Python /
PIL fallbacks).

The two extensions build in SEPARATE setup() invocations: the codec needs
libjpeg/libpng headers, and their absence must not abort the RNG build
(ADVICE r4: one combined invocation made the stated "RNG still builds
without libjpeg/libpng" goal false). The codec build is gated on a
preprocessor probe for the headers rather than a blanket try/except, so a
genuine compile regression with headers present still fails the build
loudly instead of silently shipping the slower PIL fallback.
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

def _codec_headers_available() -> bool:
    """Preprocess a probe including jpeglib.h/png.h with the system C++
    compiler. Distinguishes 'dev headers absent: skip the optional codec'
    from 'headers present but the codec fails to build: a real regression
    that must fail the build loudly'."""
    import subprocess

    probe = b"#include <stdio.h>\n#include <jpeglib.h>\n#include <png.h>\n"
    for cc in ("c++", "g++", "cc"):
        try:
            r = subprocess.run([cc, "-E", "-x", "c++", "-"], input=probe,
                               capture_output=True)
        except FileNotFoundError:
            continue
        return r.returncode == 0
    return False  # no compiler found -- the build will fail upstream anyway


if _codec_headers_available():
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
else:
    print("NOTE: optional codec extension skipped: libjpeg/libpng dev "
          "headers not found (PIL fallback will be used)", file=sys.stderr)
