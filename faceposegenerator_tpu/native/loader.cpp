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

static PyMethodDef kMethods[] = {
    {"read_idx", py_read_idx, METH_VARARGS,
     "read_idx(path) -> (keys_i64_bytes, offsets_i64_bytes)"},
    {"read_records", py_read_records, METH_VARARGS,
     "read_records(path, offsets) -> list[(labels_f32_bytes, payload_bytes)]"},
    {"decode_batch", py_decode_batch, METH_VARARGS,
     "decode_batch(payloads, out_f32_buffer, size, nthreads)"},
    {"decode_rgb", py_decode_rgb, METH_VARARGS,
     "decode_rgb(jpeg_bytes) -> (rgb_bytes, width, height)"},
    {nullptr, nullptr, 0, nullptr},
};

static PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_fpg_loader",
    "Native RecordIO + JPEG data-loader core", -1, kMethods,
};

PyMODINIT_FUNC PyInit__fpg_loader(void) { return PyModule_Create(&kModule); }
