// Native (C++) image codec for spread_spectrum_watermarking_tpu.
//
// The reference crate's layer 0 is the Rust `image` crate: JPEG/PNG decode
// and encode feeding `into_rgb32f`/`into_rgb8` (reference: Cargo.toml:9,
// SURVEY.md layer 0). This module provides that layer natively on top of the
// system libjpeg + libpng, with the GIL released during codec work so the
// Python-side ThreadPool batch loader (utils/image_io.load_batch_u8) scales
// across cores -- the host-side ingest path of the corpus pipelines.
//
// Parity: PIL is itself libjpeg-backed, and PIL's .convert("RGB") drops the
// alpha channel without compositing. Decoding here uses libjpeg's default
// JDCT_ISLOW (PIL's default) and, for PNG, reads RGBA and strips alpha --
// byte-identical pixels to the PIL path on baseline JPEG and 8-bit PNG
// (asserted against the repo's reference assets in tests/test_native.py).
// Anything the module cannot decode raises; callers fall back to PIL.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

// ----------------------------------------------------------------------------
// JPEG decode (libjpeg, setjmp error trampoline -- the default handler exits)
// ----------------------------------------------------------------------------

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
  char msg[JMSG_LENGTH_MAX];
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = (JpegErr*)cinfo->err;
  (*cinfo->err->format_message)(cinfo, err->msg);
  longjmp(err->jump, 1);
}

// Returns true on success; fills rgb (H*W*3), h, w. On failure fills msg.
bool decode_jpeg(const uint8_t* buf, size_t len, std::vector<uint8_t>* rgb,
                 unsigned* h, unsigned* w, char* msg) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    std::snprintf(msg, JMSG_LENGTH_MAX, "%s", err.msg);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, buf, len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;  // gray is upconverted; CMYK errors out
  cinfo.dct_method = JDCT_ISLOW;    // PIL's default -- bit parity
  jpeg_start_decompress(&cinfo);
  *h = cinfo.output_height;
  *w = cinfo.output_width;
  if (cinfo.output_components != 3) {
    std::snprintf(msg, JMSG_LENGTH_MAX, "unexpected component count %d",
                  cinfo.output_components);
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  rgb->resize((size_t)*h * *w * 3);
  size_t stride = (size_t)*w * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = rgb->data() + (size_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ----------------------------------------------------------------------------
// PNG decode (libpng simplified API): read RGBA, strip alpha like PIL's
// convert("RGB") (no compositing), so pixels match the PIL path exactly.
// ----------------------------------------------------------------------------

// Parity guard: libpng's simplified read API silently applies sRGB gamma
// conversion (gAMA/iCCP-chunked files) and 16-to-8 scaling (16-bit files),
// which PIL's convert("RGB") does not -- such files would decode to
// non-PIL-identical pixels instead of hitting the byte-parity contract
// image_io relies on. Scan the IHDR bit depth and the pre-IDAT chunk types
// and refuse those files here so load_rgb_u8 falls back to PIL.
bool png_is_plain_8bit(const uint8_t* buf, size_t len, char* msg) {
  // IHDR is the first chunk: length @8, type "IHDR" @12, data @16,
  // bit depth at data+8 = byte 24.
  if (len < 33 || std::memcmp(buf + 12, "IHDR", 4) != 0) {
    std::snprintf(msg, JMSG_LENGTH_MAX, "malformed PNG header");
    return false;
  }
  if (buf[24] != 8) {
    std::snprintf(msg, JMSG_LENGTH_MAX,
                  "%d-bit PNG (PIL-parity path handles 8-bit only)", buf[24]);
    return false;
  }
  // Color chunks must precede IDAT (PNG spec 5.6), so scanning to IDAT sees
  // every gAMA/iCCP the file can carry.
  size_t off = 8;
  while (off + 8 <= len) {
    uint32_t chunk_len = ((uint32_t)buf[off] << 24) |
                         ((uint32_t)buf[off + 1] << 16) |
                         ((uint32_t)buf[off + 2] << 8) | buf[off + 3];
    const uint8_t* type = buf + off + 4;
    if (std::memcmp(type, "IDAT", 4) == 0) break;
    if (std::memcmp(type, "gAMA", 4) == 0 ||
        std::memcmp(type, "iCCP", 4) == 0) {
      std::snprintf(msg, JMSG_LENGTH_MAX,
                    "PNG carries a %.4s chunk (libpng would gamma-convert; "
                    "PIL does not)", (const char*)type);
      return false;
    }
    off += 12 + (size_t)chunk_len;  // len + type + data + crc
  }
  return true;
}

bool decode_png(const uint8_t* buf, size_t len, std::vector<uint8_t>* rgb,
                unsigned* h, unsigned* w, char* msg) {
  if (!png_is_plain_8bit(buf, len, msg)) return false;
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_memory(&image, buf, len)) {
    std::snprintf(msg, JMSG_LENGTH_MAX, "%s", image.message);
    return false;
  }
  image.format = PNG_FORMAT_RGBA;
  std::vector<uint8_t> rgba((size_t)PNG_IMAGE_SIZE(image));
  if (!png_image_finish_read(&image, nullptr, rgba.data(), 0, nullptr)) {
    std::snprintf(msg, JMSG_LENGTH_MAX, "%s", image.message);
    png_image_free(&image);
    return false;
  }
  *h = image.height;
  *w = image.width;
  rgb->resize((size_t)*h * *w * 3);
  const uint8_t* src = rgba.data();
  uint8_t* dst = rgb->data();
  for (size_t i = 0, n = (size_t)*h * *w; i < n; i++) {
    dst[3 * i + 0] = src[4 * i + 0];
    dst[3 * i + 1] = src[4 * i + 1];
    dst[3 * i + 2] = src[4 * i + 2];
  }
  return true;
}

// ----------------------------------------------------------------------------
// PNG encode (libpng simplified API), RGB8 -- the reference CLI's output
// format (examples/main.rs:278 writes "<stem>_wm.png").
// ----------------------------------------------------------------------------

bool encode_png(const uint8_t* rgb, unsigned h, unsigned w,
                std::vector<uint8_t>* out, char* msg) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  image.width = w;
  image.height = h;
  image.format = PNG_FORMAT_RGB;
  // Fast filtering/compression: batch writers are encode-bound and PNG is
  // lossless either way (file is ~15% larger, ~3x faster than the default).
  image.flags = PNG_IMAGE_FLAG_FAST;
  png_alloc_size_t size = 0;
  if (!png_image_write_to_memory(&image, nullptr, &size, 0, rgb, 0, nullptr)) {
    std::snprintf(msg, JMSG_LENGTH_MAX, "%s", image.message);
    return false;
  }
  out->resize(size);
  if (!png_image_write_to_memory(&image, out->data(), &size, 0, rgb, 0,
                                 nullptr)) {
    std::snprintf(msg, JMSG_LENGTH_MAX, "%s", image.message);
    return false;
  }
  out->resize(size);
  return true;
}

// ----------------------------------------------------------------------------
// Python bindings
// ----------------------------------------------------------------------------

PyObject* py_decode_rgb(PyObject*, PyObject* args) {
  Py_buffer view;
  if (!PyArg_ParseTuple(args, "y*", &view)) return nullptr;
  const uint8_t* buf = (const uint8_t*)view.buf;
  size_t len = (size_t)view.len;
  std::vector<uint8_t> rgb;
  unsigned h = 0, w = 0;
  char msg[JMSG_LENGTH_MAX] = "unrecognized image format";
  bool ok = false;
  int kind = 0;  // 1 = jpeg, 2 = png
  if (len >= 2 && buf[0] == 0xFF && buf[1] == 0xD8) kind = 1;
  else if (len >= 8 && std::memcmp(buf, "\x89PNG\r\n\x1a\n", 8) == 0) kind = 2;
  Py_BEGIN_ALLOW_THREADS
  if (kind == 1) ok = decode_jpeg(buf, len, &rgb, &h, &w, msg);
  else if (kind == 2) ok = decode_png(buf, len, &rgb, &h, &w, msg);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_Format(PyExc_ValueError, "native decode failed: %s", msg);
    return nullptr;
  }
  PyObject* data =
      PyBytes_FromStringAndSize((const char*)rgb.data(), (Py_ssize_t)rgb.size());
  if (!data) return nullptr;
  return Py_BuildValue("(NII)", data, h, w);
}

PyObject* py_encode_png(PyObject*, PyObject* args) {
  Py_buffer view;
  unsigned h, w;
  if (!PyArg_ParseTuple(args, "y*II", &view, &h, &w)) return nullptr;
  if ((size_t)view.len != (size_t)h * w * 3) {
    PyBuffer_Release(&view);
    PyErr_SetString(PyExc_ValueError, "buffer size != h*w*3");
    return nullptr;
  }
  std::vector<uint8_t> out;
  char msg[JMSG_LENGTH_MAX] = "";
  bool ok = false;
  Py_BEGIN_ALLOW_THREADS
  ok = encode_png((const uint8_t*)view.buf, h, w, &out, msg);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!ok) {
    PyErr_Format(PyExc_ValueError, "native png encode failed: %s", msg);
    return nullptr;
  }
  return PyBytes_FromStringAndSize((const char*)out.data(),
                                   (Py_ssize_t)out.size());
}

PyMethodDef methods[] = {
    {"decode_rgb_bytes", py_decode_rgb, METH_VARARGS,
     "JPEG/PNG bytes -> (rgb_bytes, h, w), 8-bit RGB, PIL-parity pixels."},
    {"encode_png_bytes", py_encode_png, METH_VARARGS,
     "(rgb_bytes, h, w) -> PNG file bytes."},
    {nullptr, nullptr, 0, nullptr}};

struct PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_codec_impl",
                                "Native JPEG/PNG codec (libjpeg + libpng).",
                                -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__codec_impl(void) { return PyModule_Create(&moduledef); }
