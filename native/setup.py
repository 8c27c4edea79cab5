"""Build the C++ native extension in place.

Usage (from the repo root):
    python native/setup.py build_ext --build-lib .

This drops ``spread_spectrum_watermarking_tpu/utils/_native_impl*.so`` next to
the Python shim. The framework works without it (pure-Python fallbacks); with
it, bulk mark generation and host-side quantization run natively.
"""

import os

from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="ssw-native",
    ext_modules=[
        Extension(
            "spread_spectrum_watermarking_tpu.utils._native_impl",
            sources=[os.path.join(here, "ssw_native.cpp")],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        ),
        # Separate module so environments without libjpeg/libpng dev files
        # can still build the RNG/quantization extension above.
        Extension(
            "spread_spectrum_watermarking_tpu.utils._codec_impl",
            sources=[os.path.join(here, "ssw_codec.cpp")],
            libraries=["jpeg", "png"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
        ),
    ],
    script_args=os.sys.argv[1:] or ["build_ext", "--build-lib", "."],
)
