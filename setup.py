"""Build shim: compiles the C++ native extension into the package.

The extension is optional at runtime (pure-Python fallbacks exist in
``utils/rng_compat.py`` / ``ops/colorspace.py``); a prebuilt ``.so`` is also
vendored for the current interpreter so the package works without a compile
step. Metadata lives in pyproject.toml.
"""

from setuptools import Extension, setup

setup(
    ext_modules=[
        Extension(
            "spread_spectrum_watermarking_tpu.utils._native_impl",
            sources=["native/ssw_native.cpp"],
            extra_compile_args=["-O3", "-std=c++17", "-Wall"],
            language="c++",
            optional=True,  # pure-Python fallbacks exist
        )
    ],
)
