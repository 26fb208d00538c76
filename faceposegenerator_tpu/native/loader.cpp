// Native data-loader core: RecordIO batch reads + libjpeg decode + resize.
//
// The reference delegates this layer to native code in mxnet (RecordIO +
// imdecode, `FR_training/utils/dataset.py` MXFaceDataset) and to PIL/cv2 in
// the eval scripts; this module owns the same layer for the TPU framework:
// thread-parallel record extraction and JPEG→float32 tensor decode with the
// GIL released, feeding host batches to the jit-compiled train step.
//
// Exposed functions (CPython C API only — no pybind11 in this image):
//   read_idx(path)                      -> (keys int64 bytes, offsets int64 bytes)
//   read_records(path, offsets)        -> list[(labels_f32_bytes, payload_bytes)]
//   decode_batch(payloads, out, size, nthreads) -> None
//       payloads: list[bytes] of JPEG streams
//       out: writable buffer of float32 [n, size, size, 3], filled with
//            (x/255 - 0.5)/0.5 RGB (the MXFaceDataset normalization,
//            FR_training/utils/dataset.py:100-110 equivalent)
//   decode_rgb(payload) -> (bytes, width, height)   raw RGB8, parity tests
//
// Build: see native/__init__.py (g++ -O3 -shared -fPIC ... -ljpeg).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <atomic>
#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <cmath>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

#include <jpeglib.h>

namespace {

constexpr uint32_t kMagic = 0xCED7230A;

// ---------------------------------------------------------------- JPEG ----

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
  char message[JMSG_LENGTH_MAX];
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, err->message);
  longjmp(err->jump, 1);
}

// Decodes a JPEG stream to tightly-packed RGB8. Returns false on corrupt
// input (writes the libjpeg message into `errmsg`).
bool decode_jpeg_rgb(const unsigned char* data, size_t len,
                     std::vector<unsigned char>* rgb, int* width, int* height,
                     std::string* errmsg) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    *errmsg = jerr.message;
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const size_t row = static_cast<size_t>(*width) * 3;
  rgb->resize(row * *height);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* dst = rgb->data() + row * cinfo.output_scanline;
    jpeg_read_scanlines(&cinfo, &dst, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize (pixel-center aligned, no antialias — cv2.INTER_LINEAR
// semantics) + [-1, 1] float32 normalization, fused in one pass.
void resize_normalize(const unsigned char* rgb, int w, int h, int size,
                      float* out) {
  const float sx = static_cast<float>(w) / size;
  const float sy = static_cast<float>(h) / size;
  const bool identity = (w == size && h == size);
  for (int y = 0; y < size; ++y) {
    float* orow = out + static_cast<size_t>(y) * size * 3;
    if (identity) {
      const unsigned char* irow = rgb + static_cast<size_t>(y) * w * 3;
      for (int i = 0; i < size * 3; ++i) {
        orow[i] = (irow[i] * (1.0f / 255.0f) - 0.5f) * 2.0f;
      }
      continue;
    }
    float fy = (y + 0.5f) * sy - 0.5f;
    if (fy < 0) fy = 0;
    int y0 = static_cast<int>(fy);
    if (y0 > h - 2) y0 = h - 2;
    if (y0 < 0) y0 = 0;
    // degenerate 1-pixel-tall/wide images: clamp the second sample to the
    // same row/column instead of reading one row past the decoded buffer
    int y1 = (y0 + 1 < h) ? y0 + 1 : y0;
    float wy = fy - y0;
    const unsigned char* r0 = rgb + static_cast<size_t>(y0) * w * 3;
    const unsigned char* r1 = rgb + static_cast<size_t>(y1) * w * 3;
    for (int x = 0; x < size; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      if (fx < 0) fx = 0;
      int x0 = static_cast<int>(fx);
      if (x0 > w - 2) x0 = w - 2;
      if (x0 < 0) x0 = 0;
      int x1 = (x0 + 1 < w) ? x0 + 1 : x0;
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float a = r0[x0 * 3 + c], b = r0[x1 * 3 + c];
        float cc = r1[x0 * 3 + c], d = r1[x1 * 3 + c];
        float top = a + (b - a) * wx;
        float bot = cc + (d - cc) * wx;
        float v = top + (bot - top) * wy;
        orow[x * 3 + c] = (v * (1.0f / 255.0f) - 0.5f) * 2.0f;
      }
    }
  }
}

// ---------------------------------------------------------- RecordIO ------

struct RecordView {
  const char* payload;
  Py_ssize_t payload_len;
};

}  // namespace

// read_idx(path) -> (keys_bytes, offsets_bytes) as little-endian int64 arrays
// (Python wraps with np.frombuffer; avoids per-line Python object churn).
static PyObject* py_read_idx(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  std::vector<int64_t> keys, offsets;
  {
    FILE* f = fopen(path, "r");
    if (!f) return PyErr_Format(PyExc_OSError, "cannot open %s", path);
    Py_BEGIN_ALLOW_THREADS
    char line[256];
    while (fgets(line, sizeof line, f)) {
      char* tab = strchr(line, '\t');
      if (!tab) continue;
      keys.push_back(strtoll(line, nullptr, 10));
      offsets.push_back(strtoll(tab + 1, nullptr, 10));
    }
    fclose(f);
    Py_END_ALLOW_THREADS
  }
  PyObject* kb = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(keys.data()), keys.size() * 8);
  PyObject* ob = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(offsets.data()), offsets.size() * 8);
  if (!kb || !ob) {
    Py_XDECREF(kb);
    Py_XDECREF(ob);
    return nullptr;
  }
  PyObject* tup = PyTuple_Pack(2, kb, ob);
  Py_DECREF(kb);
  Py_DECREF(ob);
  return tup;
}

// read_records(path, offsets: sequence[int]) ->
//     list[(labels_f32_bytes, payload_bytes)]
// pread-based (thread-safe, no shared file position); header parse per
// recordio.py: [magic u32 | lrecord u32] IRHeader{flag,label,id,id2} ...
static PyObject* py_read_records(PyObject*, PyObject* args) {
  const char* path;
  PyObject* offsets_obj;
  if (!PyArg_ParseTuple(args, "sO", &path, &offsets_obj)) return nullptr;
  PyObject* seq = PySequence_Fast(offsets_obj, "offsets must be a sequence");
  if (!seq) return nullptr;
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  std::vector<int64_t> offs(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    offs[i] = PyLong_AsLongLong(PySequence_Fast_GET_ITEM(seq, i));
    if (offs[i] == -1 && PyErr_Occurred()) {
      Py_DECREF(seq);
      return nullptr;
    }
  }
  Py_DECREF(seq);

  int fd = open(path, O_RDONLY);
  if (fd < 0) return PyErr_Format(PyExc_OSError, "cannot open %s", path);

  std::vector<std::vector<char>> bufs(n);
  std::string error;
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; ++i) {
    unsigned char head[8];
    if (pread(fd, head, 8, offs[i]) != 8) {
      error = "short read at record header";
      break;
    }
    uint32_t magic, lrec;
    memcpy(&magic, head, 4);
    memcpy(&lrec, head + 4, 4);
    if (magic != kMagic) {
      error = "bad RecordIO magic";
      break;
    }
    uint32_t length = lrec & ((1u << 29) - 1);
    bufs[i].resize(length);
    if (pread(fd, bufs[i].data(), length, offs[i] + 8) !=
        static_cast<ssize_t>(length)) {
      error = "short read at record body";
      break;
    }
  }
  close(fd);
  Py_END_ALLOW_THREADS
  if (!error.empty()) {
    PyErr_SetString(PyExc_ValueError, error.c_str());
    return nullptr;
  }

  PyObject* out = PyList_New(n);
  if (!out) return nullptr;
  for (Py_ssize_t i = 0; i < n; ++i) {
    const std::vector<char>& b = bufs[i];
    if (b.size() < 24) {
      Py_DECREF(out);
      PyErr_SetString(PyExc_ValueError, "record shorter than IRHeader");
      return nullptr;
    }
    uint32_t flag;
    memcpy(&flag, b.data(), 4);
    PyObject* labels;
    size_t off = 24;
    if (flag > 0) {
      size_t nl = static_cast<size_t>(flag) * 4;
      if (b.size() < off + nl) {
        Py_DECREF(out);
        PyErr_SetString(PyExc_ValueError, "record label block truncated");
        return nullptr;
      }
      labels = PyBytes_FromStringAndSize(b.data() + off, nl);
      off += nl;
    } else {
      labels = PyBytes_FromStringAndSize(b.data() + 4, 4);  // scalar label
    }
    PyObject* payload =
        PyBytes_FromStringAndSize(b.data() + off, b.size() - off);
    if (!labels || !payload) {
      Py_XDECREF(labels);
      Py_XDECREF(payload);
      Py_DECREF(out);
      return nullptr;
    }
    PyObject* tup = PyTuple_Pack(2, labels, payload);
    Py_DECREF(labels);
    Py_DECREF(payload);
    if (!tup) {
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, i, tup);
  }
  return out;
}

// decode_batch(payloads: list[bytes], out: writable f32 buffer
//              [n*size*size*3], size: int, nthreads: int) -> None
static PyObject* py_decode_batch(PyObject*, PyObject* args) {
  PyObject* payloads;
  Py_buffer out;
  int size, nthreads;
  if (!PyArg_ParseTuple(args, "Ow*ii", &payloads, &out, &size, &nthreads))
    return nullptr;
  PyObject* seq = PySequence_Fast(payloads, "payloads must be a sequence");
  if (!seq) {
    PyBuffer_Release(&out);
    return nullptr;
  }
  Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  const size_t per = static_cast<size_t>(size) * size * 3 * sizeof(float);
  if (static_cast<size_t>(out.len) < per * n) {
    Py_DECREF(seq);
    PyBuffer_Release(&out);
    PyErr_SetString(PyExc_ValueError, "output buffer too small");
    return nullptr;
  }
  std::vector<RecordView> views(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, i);
    char* p;
    Py_ssize_t len;
    if (PyBytes_AsStringAndSize(item, &p, &len) < 0) {
      Py_DECREF(seq);
      PyBuffer_Release(&out);
      return nullptr;
    }
    views[i] = {p, len};
  }

  float* outf = static_cast<float*>(out.buf);
  std::atomic<Py_ssize_t> next(0);
  std::atomic<bool> failed(false);
  std::string errmsg;
  if (nthreads < 1) nthreads = 1;
  if (nthreads > n) nthreads = static_cast<int>(n);

  Py_BEGIN_ALLOW_THREADS {
    auto worker = [&]() {
      std::vector<unsigned char> rgb;
      for (;;) {
        Py_ssize_t i = next.fetch_add(1);
        if (i >= n || failed.load(std::memory_order_relaxed)) break;
        int w, h;
        std::string err;
        if (!decode_jpeg_rgb(
                reinterpret_cast<const unsigned char*>(views[i].payload),
                views[i].payload_len, &rgb, &w, &h, &err)) {
          bool expected = false;
          if (failed.compare_exchange_strong(expected, true)) errmsg = err;
          break;
        }
        resize_normalize(rgb.data(), w, h, size, outf + per / 4 * i);
      }
    };
    if (nthreads <= 1) {
      worker();
    } else {
      std::vector<std::thread> pool;
      pool.reserve(nthreads);
      for (int t = 0; t < nthreads; ++t) pool.emplace_back(worker);
      for (auto& t : pool) t.join();
    }
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(seq);
  PyBuffer_Release(&out);
  if (failed.load()) {
    PyErr_Format(PyExc_ValueError, "JPEG decode failed: %s", errmsg.c_str());
    return nullptr;
  }
  Py_RETURN_NONE;
}

// decode_rgb(payload: bytes) -> (rgb_bytes, width, height) — parity tests
static PyObject* py_decode_rgb(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  std::vector<unsigned char> rgb;
  int w, h;
  std::string err;
  bool ok;
  Py_BEGIN_ALLOW_THREADS
  ok = decode_jpeg_rgb(static_cast<const unsigned char*>(buf.buf), buf.len,
                       &rgb, &w, &h, &err);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (!ok) {
    PyErr_Format(PyExc_ValueError, "JPEG decode failed: %s", err.c_str());
    return nullptr;
  }
  PyObject* b = PyBytes_FromStringAndSize(
      reinterpret_cast<const char*>(rgb.data()), rgb.size());
  if (!b) return nullptr;
  PyObject* tup = Py_BuildValue("(Nii)", b, w, h);
  return tup;
}

// ----------------------------------------------------------------- PNG ----
// Stored-deflate PNG writer: valid lossless PNGs at ~memcpy speed. The
// sweep/serving layers write thousands of generated images; zlib-compressed
// encode via PIL measured ~200 ms per 512² image ON THE SINGLE HOST CPU of
// the TPU VM (perf/r3_sweep_matrix.jsonl) — pure host-side dead time. A
// stored (BTYPE=00) deflate stream is still a spec-conformant PNG, costs
// one pass of CRC/adler arithmetic, and releases the GIL.

uint32_t crc_table[256];
std::atomic<bool> crc_init{false};

void init_crc() {
  bool expected = false;
  static std::atomic<bool> building{false};
  if (crc_init.load()) return;
  if (building.compare_exchange_strong(expected, true)) {
    for (uint32_t n = 0; n < 256; ++n) {
      uint32_t c = n;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
      crc_table[n] = c;
    }
    crc_init.store(true);
  } else {
    while (!crc_init.load()) {}
  }
}

uint32_t crc32_update(uint32_t crc, const uint8_t* p, size_t n) {
  crc ^= 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) crc = crc_table[(crc ^ p[i]) & 0xFF] ^ (crc >> 8);
  return crc ^ 0xFFFFFFFFu;
}

uint32_t adler32_update(uint32_t adler, const uint8_t* p, size_t n) {
  uint32_t a = adler & 0xFFFF, b = (adler >> 16) & 0xFFFF;
  size_t i = 0;
  while (i < n) {
    size_t chunk = (n - i < 5552) ? n - i : 5552;  // overflow-safe stride
    for (size_t j = 0; j < chunk; ++j) { a += p[i + j]; b += a; }
    a %= 65521; b %= 65521;
    i += chunk;
  }
  return (b << 16) | a;
}

void put_be32(std::vector<uint8_t>& v, uint32_t x) {
  v.push_back(x >> 24); v.push_back(x >> 16); v.push_back(x >> 8); v.push_back(x);
}

void put_chunk(std::vector<uint8_t>& v, const char type[4], const uint8_t* data,
               size_t n) {
  put_be32(v, static_cast<uint32_t>(n));
  size_t type_at = v.size();
  v.insert(v.end(), type, type + 4);
  v.insert(v.end(), data, data + n);
  uint32_t crc = crc32_update(0, v.data() + type_at, n + 4);
  put_be32(v, crc);
}

bool write_png_rgb8(const uint8_t* rgb, int w, int h, const char* path,
                    std::string* err) {
  init_crc();
  std::vector<uint8_t> out;
  const size_t row = static_cast<size_t>(w) * 3;
  const size_t raw_len = (row + 1) * h;  // +1 filter byte per scanline
  out.reserve(raw_len + raw_len / 32768 * 5 + 128);
  static const uint8_t sig[8] = {0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A};
  out.insert(out.end(), sig, sig + 8);
  uint8_t ihdr[13];
  ihdr[0] = w >> 24; ihdr[1] = w >> 16; ihdr[2] = w >> 8; ihdr[3] = w;
  ihdr[4] = h >> 24; ihdr[5] = h >> 16; ihdr[6] = h >> 8; ihdr[7] = h;
  ihdr[8] = 8; ihdr[9] = 2; ihdr[10] = 0; ihdr[11] = 0; ihdr[12] = 0;
  put_chunk(out, "IHDR", ihdr, 13);

  // filtered scanlines (filter 0) → one contiguous raw buffer
  std::vector<uint8_t> raw(raw_len);
  for (int y = 0; y < h; ++y) {
    uint8_t* dst = raw.data() + static_cast<size_t>(y) * (row + 1);
    dst[0] = 0;
    std::memcpy(dst + 1, rgb + static_cast<size_t>(y) * row, row);
  }

  // IDAT: zlib header + stored deflate blocks + adler32
  std::vector<uint8_t> idat;
  idat.reserve(raw_len + raw_len / 32768 * 5 + 16);
  idat.push_back(0x78); idat.push_back(0x01);
  size_t off = 0;
  while (off < raw_len) {
    size_t blk = raw_len - off;
    if (blk > 65535) blk = 65535;
    const bool final = (off + blk == raw_len);
    idat.push_back(final ? 1 : 0);
    idat.push_back(blk & 0xFF); idat.push_back((blk >> 8) & 0xFF);
    idat.push_back(~blk & 0xFF); idat.push_back((~blk >> 8) & 0xFF);
    idat.insert(idat.end(), raw.data() + off, raw.data() + off + blk);
    off += blk;
  }
  uint32_t adler = adler32_update(1, raw.data(), raw_len);
  put_be32(idat, adler);
  put_chunk(out, "IDAT", idat.data(), idat.size());
  put_chunk(out, "IEND", nullptr, 0);

  FILE* f = std::fopen(path, "wb");
  if (!f) { *err = std::string("open failed: ") + path; return false; }
  const bool ok = std::fwrite(out.data(), 1, out.size(), f) == out.size();
  std::fclose(f);
  if (!ok) { *err = std::string("short write: ") + path; return false; }
  return true;
}

// write_png_batch(images_u8_buffer [n,h,w,3], h, w, paths: list[str], nthreads)
static PyObject* py_write_png_batch(PyObject*, PyObject* args) {
  Py_buffer buf;
  PyObject* paths_obj;
  int imh, imw, nthreads;
  if (!PyArg_ParseTuple(args, "y*iiOi", &buf, &imh, &imw, &paths_obj, &nthreads))
    return nullptr;
  PyObject* seq = PySequence_Fast(paths_obj, "paths must be a sequence");
  if (!seq) { PyBuffer_Release(&buf); return nullptr; }
  const Py_ssize_t n = PySequence_Fast_GET_SIZE(seq);
  std::vector<std::string> paths(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* s = PySequence_Fast_GET_ITEM(seq, i);
    const char* c = PyUnicode_AsUTF8(s);
    if (!c) { Py_DECREF(seq); PyBuffer_Release(&buf); return nullptr; }
    paths[i] = c;
  }
  Py_DECREF(seq);
  if (n == 0) { PyBuffer_Release(&buf); Py_RETURN_NONE; }
  const size_t per = static_cast<size_t>(imh) * imw * 3;
  if (per == 0 || static_cast<size_t>(buf.len) != per * n) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "buffer does not match [n, h, w, 3] uint8");
    return nullptr;
  }
  const uint8_t* base = static_cast<const uint8_t*>(buf.buf);
  std::string err;
  std::atomic<bool> failed{false};
  std::atomic<Py_ssize_t> next{0};
  Py_BEGIN_ALLOW_THREADS
  init_crc();
  int nt = nthreads > 0 ? nthreads : 1;
  if (nt > n) nt = static_cast<int>(n);
  std::vector<std::thread> workers;
  for (int t = 0; t < nt; ++t) {
    workers.emplace_back([&]() {
      for (;;) {
        Py_ssize_t i = next.fetch_add(1);
        if (i >= n || failed.load()) break;
        std::string e;
        if (!write_png_rgb8(base + per * i, imw, imh, paths[i].c_str(), &e)) {
          failed.store(true);
          err = e;
        }
      }
    });
  }
  for (auto& w : workers) w.join();
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&buf);
  if (failed.load()) {
    PyErr_SetString(PyExc_OSError, err.c_str());
    return nullptr;
  }
  Py_RETURN_NONE;
}

static PyMethodDef kMethods[] = {
    {"read_idx", py_read_idx, METH_VARARGS,
     "read_idx(path) -> (keys_i64_bytes, offsets_i64_bytes)"},
    {"read_records", py_read_records, METH_VARARGS,
     "read_records(path, offsets) -> list[(labels_f32_bytes, payload_bytes)]"},
    {"decode_batch", py_decode_batch, METH_VARARGS,
     "decode_batch(payloads, out_f32_buffer, size, nthreads)"},
    {"decode_rgb", py_decode_rgb, METH_VARARGS,
     "decode_rgb(jpeg_bytes) -> (rgb_bytes, width, height)"},
    {"write_png_batch", py_write_png_batch, METH_VARARGS,
     "write_png_batch(images_u8_buffer, h, w, paths, nthreads) — stored-"
     "deflate lossless PNGs, GIL released"},
    {nullptr, nullptr, 0, nullptr},
};

static PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_fpg_loader",
    "Native RecordIO + JPEG data-loader core", -1, kMethods,
};

PyMODINIT_FUNC PyInit__fpg_loader(void) { return PyModule_Create(&kModule); }
