// Native (C++) runtime components for spread_spectrum_watermarking_tpu.
//
// The reference crate's host-side native layers are the `rand`/`rand_chacha`/
// `rand_distr` RNG stack and the `image` crate's u8<->f32 conversions
// (reference: Cargo.toml:8-21). This module provides the same roles natively:
//
//   - generate_fixed_normal_sequence(seed, length): bit-identical to
//     ChaCha8Rng::seed_from_u64 + rand_distr StandardNormal (the reference's
//     fixture generator, tests/util.rs:6-13) -- and to the pure-Python
//     fallback in utils/rng_compat.py, ~100x faster for bulk mark generation.
//   - quantize_u8(f32 array): the image crate's into_rgb8 rounding
//     (clamp(x,0,1)*255, round half away from zero).
//   - dequantize_f32(u8 array): into_rgb32f (x/255).
//
// Exactness notes: ziggurat tables are regenerated at import with the same
// recurrence and constants as rand's generator script; exp/log/sqrt come from
// the same libm as CPython's, so the tables match the Python fallback
// bit-for-bit (asserted in tests/test_native.py).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ----------------------------------------------------------------------------
// rand_core seed_from_u64 (PCG32-style expansion)
// ----------------------------------------------------------------------------

void seed_from_u64(uint64_t seed, uint8_t out[32]) {
  const uint64_t MUL = 6364136223846793005ULL;
  const uint64_t INC = 11634580027462260723ULL;
  uint64_t state = seed;
  for (int i = 0; i < 8; i++) {
    state = state * MUL + INC;
    uint32_t xorshifted = (uint32_t)(((state >> 18) ^ state) >> 27);
    uint32_t rot = (uint32_t)(state >> 59);
    uint32_t x = (xorshifted >> rot) | (xorshifted << ((32 - rot) & 31));
    std::memcpy(out + 4 * i, &x, 4);
  }
}

// ----------------------------------------------------------------------------
// ChaCha8 (djb variant; 64-bit counter words 12-13, 64-bit stream id = 0)
// ----------------------------------------------------------------------------

inline uint32_t rotl32(uint32_t v, int n) { return (v << n) | (v >> (32 - n)); }

void chacha_block(const uint32_t key[8], uint64_t counter, int rounds,
                  uint32_t out[16]) {
  uint32_t s[16] = {0x61707865u, 0x3320646Eu, 0x79622D32u, 0x6B206574u,
                    key[0], key[1], key[2], key[3],
                    key[4], key[5], key[6], key[7],
                    (uint32_t)(counter & 0xFFFFFFFFu),
                    (uint32_t)(counter >> 32), 0u, 0u};
  uint32_t x[16];
  std::memcpy(x, s, sizeof(s));
#define QR(a, b, c, d)                      \
  x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 16); \
  x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 12); \
  x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 8);  \
  x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 7)
  for (int r = 0; r < rounds / 2; r++) {
    QR(0, 4, 8, 12); QR(1, 5, 9, 13); QR(2, 6, 10, 14); QR(3, 7, 11, 15);
    QR(0, 5, 10, 15); QR(1, 6, 11, 12); QR(2, 7, 8, 13); QR(3, 4, 9, 14);
  }
#undef QR
  for (int i = 0; i < 16; i++) out[i] = x[i] + s[i];
}

struct ChaChaRng {
  uint32_t key[8];
  uint64_t counter = 0;
  uint32_t buf[64];  // 4 blocks, matching rand_chacha's BlockRng refill
  int index = 64;
  int rounds;

  ChaChaRng(uint64_t seed, int rounds_ = 8) : rounds(rounds_) {
    uint8_t sb[32];
    seed_from_u64(seed, sb);
    std::memcpy(key, sb, 32);
  }

  void refill() {
    for (int i = 0; i < 4; i++) chacha_block(key, counter + i, rounds, buf + 16 * i);
    counter += 4;
    index = 0;
  }

  inline uint32_t next_u32() {
    if (index >= 64) refill();
    return buf[index++];
  }

  inline uint64_t next_u64() {
    uint64_t lo = next_u32();
    uint64_t hi = next_u32();
    return (hi << 32) | lo;
  }
};

// ----------------------------------------------------------------------------
// rand_distr StandardNormal: 256-layer ziggurat (f64), f32 = cast
// ----------------------------------------------------------------------------

const double ZIG_NORM_R = 3.654152885361008796;
const double ZIG_NORM_AREA = 0.00492867323399;
double ZIG_X[257];
double ZIG_F[257];

void build_tables() {
  auto f = [](double x) { return std::exp(-x * x / 2.0); };
  auto f_inv = [](double y) { return std::sqrt(-2.0 * std::log(y)); };
  ZIG_X[0] = ZIG_NORM_AREA / f(ZIG_NORM_R);
  ZIG_X[1] = ZIG_NORM_R;
  for (int i = 1; i < 255; i++)
    ZIG_X[i + 1] = f_inv(ZIG_NORM_AREA / ZIG_X[i] + f(ZIG_X[i]));
  ZIG_X[256] = 0.0;
  for (int i = 0; i <= 256; i++) ZIG_F[i] = f(ZIG_X[i]);
}

inline double u64_to_f64_exp(uint64_t bits, int exponent) {
  uint64_t out_bits = (bits >> 12) | ((uint64_t)(1023 + exponent) << 52);
  double d;
  std::memcpy(&d, &out_bits, 8);
  return d;
}

inline double standard_f64(ChaChaRng& rng) {
  return (double)(rng.next_u64() >> 11) * (1.0 / 9007199254740992.0);
}

inline double open_closed_01(ChaChaRng& rng) {
  return (double)((rng.next_u64() >> 11) + 1) * (1.0 / 9007199254740992.0);
}

double standard_normal_f64(ChaChaRng& rng) {
  for (;;) {
    uint64_t bits = rng.next_u64();
    int i = (int)(bits & 0xFF);
    double u = u64_to_f64_exp(bits, 1) - 3.0;
    double x = u * ZIG_X[i];
    if (std::fabs(x) < ZIG_X[i + 1]) return x;
    if (i == 0) {
      double tx = 1.0, ty = 0.0;
      while (-2.0 * ty < tx * tx) {
        tx = std::log(open_closed_01(rng)) / ZIG_NORM_R;
        ty = std::log(open_closed_01(rng));
      }
      return u < 0.0 ? tx - ZIG_NORM_R : ZIG_NORM_R - tx;
    }
    if (ZIG_F[i + 1] + (ZIG_F[i] - ZIG_F[i + 1]) * standard_f64(rng) <
        std::exp(-x * x / 2.0))
      return x;
  }
}

// ----------------------------------------------------------------------------
// Python bindings (CPython C API; returns bytes buffers the Python shim wraps
// as numpy arrays to avoid a compile-time numpy header dependency)
// ----------------------------------------------------------------------------

PyObject* py_generate_fixed_normal_sequence(PyObject*, PyObject* args) {
  unsigned long long seed;
  Py_ssize_t length;
  if (!PyArg_ParseTuple(args, "Kn", &seed, &length)) return nullptr;
  if (length < 0) {
    PyErr_SetString(PyExc_ValueError, "length must be non-negative");
    return nullptr;
  }
  PyObject* out = PyBytes_FromStringAndSize(nullptr, length * 4);
  if (!out) return nullptr;
  float* data = (float*)PyBytes_AS_STRING(out);
  Py_BEGIN_ALLOW_THREADS
  ChaChaRng rng((uint64_t)seed);
  for (Py_ssize_t i = 0; i < length; i++)
    data[i] = (float)standard_normal_f64(rng);
  Py_END_ALLOW_THREADS
  return out;
}

PyObject* py_chacha8_u64s(PyObject*, PyObject* args) {
  unsigned long long seed;
  Py_ssize_t count;
  if (!PyArg_ParseTuple(args, "Kn", &seed, &count)) return nullptr;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, count * 8);
  if (!out) return nullptr;
  uint64_t* data = (uint64_t*)PyBytes_AS_STRING(out);
  ChaChaRng rng((uint64_t)seed);
  for (Py_ssize_t i = 0; i < count; i++) data[i] = rng.next_u64();
  return out;
}

PyObject* py_quantize_u8(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  Py_ssize_t n = view.len / 4;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n);
  if (!out) { PyBuffer_Release(&view); return nullptr; }
  const float* in = (const float*)view.buf;
  uint8_t* dst = (uint8_t*)PyBytes_AS_STRING(out);
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; i++) {
    float x = in[i];
    if (!(x > 0.0f)) x = 0.0f;  // also maps NaN to 0, like image's NormalizeFloat
    if (x > 1.0f) x = 1.0f;
    dst[i] = (uint8_t)(x * 255.0f + 0.5f);
  }
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return out;
}

PyObject* py_dequantize_f32(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  Py_ssize_t n = view.len;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * 4);
  if (!out) { PyBuffer_Release(&view); return nullptr; }
  const uint8_t* in = (const uint8_t*)view.buf;
  float* dst = (float*)PyBytes_AS_STRING(out);
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; i++) dst[i] = (float)in[i] / 255.0f;
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  return out;
}

PyMethodDef methods[] = {
    {"generate_fixed_normal_sequence_bytes", py_generate_fixed_normal_sequence,
     METH_VARARGS,
     "ChaCha8(seed_from_u64) + rand_distr StandardNormal f32 sequence as raw "
     "little-endian f32 bytes."},
    {"chacha8_u64s_bytes", py_chacha8_u64s, METH_VARARGS,
     "Raw ChaCha8Rng u64 stream as bytes (test hook)."},
    {"quantize_u8_bytes", py_quantize_u8, METH_VARARGS,
     "f32 buffer -> u8 bytes with image-crate rounding."},
    {"dequantize_f32_bytes", py_dequantize_f32, METH_VARARGS,
     "u8 buffer -> f32 bytes (x/255)."},
    {nullptr, nullptr, 0, nullptr}};

struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_native_impl",
                                "Native RNG + quantization kernels.", -1,
                                methods};

}  // namespace

PyMODINIT_FUNC PyInit__native_impl(void) {
  build_tables();
  return PyModule_Create(&moduledef);
}
