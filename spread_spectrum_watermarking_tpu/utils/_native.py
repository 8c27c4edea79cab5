"""numpy-typed shim over the C++ native module (built from native/).

Importing this module raises ImportError when the compiled extension is
absent; callers (rng_compat, colorspace fast paths) fall back to pure Python.
Build with: ``python native/setup.py build_ext`` (see native/README.md).
"""

from __future__ import annotations

import numpy as np

from . import _native_impl  # the compiled extension; ImportError if not built


def generate_fixed_normal_sequence(seed: int, length: int) -> np.ndarray:
    buf = _native_impl.generate_fixed_normal_sequence_bytes(seed, length)
    return np.frombuffer(buf, dtype="<f4").copy()


def chacha8_u64s(seed: int, count: int) -> np.ndarray:
    buf = _native_impl.chacha8_u64s_bytes(seed, count)
    return np.frombuffer(buf, dtype="<u8").copy()


def quantize_u8(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    buf = _native_impl.quantize_u8_bytes(arr.tobytes())
    return np.frombuffer(buf, dtype=np.uint8).reshape(arr.shape).copy()


def dequantize_f32(arr: np.ndarray) -> np.ndarray:
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    buf = _native_impl.dequantize_f32_bytes(arr.tobytes())
    return np.frombuffer(buf, dtype="<f4").reshape(arr.shape).copy()
