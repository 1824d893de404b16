// Native host-side data-path kernels for the TPU framework.
//
// The reference delegates its data path to TensorFlow's C++ kernels
// (tf.data / tf.io); this extension provides the equivalent native
// speed for the TF-free pipeline:
//   * TFRecord framing with CRC32C validation (record iteration)
//   * masked CRC32C (record writing)
//   * packed-varint batch decode (tf.train.Example Int64List parsing)
//
// Built as a plain CPython extension (no pybind11 — not in this image);
// data/native.py compiles it on demand and falls back to the pure-Python
// implementations if a toolchain is unavailable.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// CRC32C (Castagnoli), software table implementation.
// ---------------------------------------------------------------------------

uint32_t g_crc_table[256];
bool g_crc_table_init = false;

void init_crc_table() {
  if (g_crc_table_init) return;
  const uint32_t poly = 0x82F63B78u;
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t crc = i;
    for (int k = 0; k < 8; ++k) {
      crc = (crc & 1) ? (crc >> 1) ^ poly : crc >> 1;
    }
    g_crc_table[i] = crc;
  }
  g_crc_table_init = true;
}

uint32_t crc32c(const uint8_t* data, size_t n) {
  init_crc_table();
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) {
    crc = g_crc_table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  }
  return crc ^ 0xFFFFFFFFu;
}

uint32_t masked_crc32c(const uint8_t* data, size_t n) {
  uint32_t crc = crc32c(data, n);
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}

// ---------------------------------------------------------------------------
// Python bindings.
// ---------------------------------------------------------------------------

PyObject* py_masked_crc32c(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  uint32_t crc = masked_crc32c(
      static_cast<const uint8_t*>(buf.buf), buf.len);
  PyBuffer_Release(&buf);
  return PyLong_FromUnsignedLong(crc);
}

// split_tfrecords(data: bytes, verify_crc: bool) -> list[bytes]
PyObject* py_split_tfrecords(PyObject*, PyObject* args) {
  Py_buffer buf;
  int verify = 0;
  if (!PyArg_ParseTuple(args, "y*p", &buf, &verify)) return nullptr;
  const uint8_t* p = static_cast<const uint8_t*>(buf.buf);
  size_t n = buf.len;

  PyObject* out = PyList_New(0);
  if (!out) {
    PyBuffer_Release(&buf);
    return nullptr;
  }
  size_t pos = 0;
  while (pos + 12 <= n) {
    uint64_t length;
    std::memcpy(&length, p + pos, 8);  // little-endian hosts only
    uint32_t stored_len_crc;
    std::memcpy(&stored_len_crc, p + pos + 8, 4);
    if (verify && masked_crc32c(p + pos, 8) != stored_len_crc) {
      PyBuffer_Release(&buf);
      Py_DECREF(out);
      PyErr_SetString(PyExc_IOError, "TFRecord length CRC mismatch");
      return nullptr;
    }
    pos += 12;
    // Overflow-safe bounds check: a corrupt 64-bit length could wrap
    // pos + length + 4 around to a small value.
    if (length > n - pos || n - pos - length < 4) {
      PyBuffer_Release(&buf);
      Py_DECREF(out);
      PyErr_SetString(PyExc_IOError, "truncated TFRecord");
      return nullptr;
    }
    if (verify) {
      uint32_t stored_data_crc;
      std::memcpy(&stored_data_crc, p + pos + length, 4);
      if (masked_crc32c(p + pos, length) != stored_data_crc) {
        PyBuffer_Release(&buf);
        Py_DECREF(out);
        PyErr_SetString(PyExc_IOError, "TFRecord data CRC mismatch");
        return nullptr;
      }
    }
    PyObject* rec = PyBytes_FromStringAndSize(
        reinterpret_cast<const char*>(p + pos), length);
    if (!rec || PyList_Append(out, rec) < 0) {
      Py_XDECREF(rec);
      PyBuffer_Release(&buf);
      Py_DECREF(out);
      return nullptr;
    }
    Py_DECREF(rec);
    pos += length + 4;
  }
  PyBuffer_Release(&buf);
  return out;
}

// decode_varints(data: bytes) -> list[int]  (packed varint run)
PyObject* py_decode_varints(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  const uint8_t* p = static_cast<const uint8_t*>(buf.buf);
  size_t n = buf.len;

  std::vector<uint64_t> values;
  values.reserve(n);
  size_t pos = 0;
  while (pos < n) {
    uint64_t v = 0;
    int shift = 0;
    bool terminated = false;
    while (pos < n) {
      uint8_t b = p[pos++];
      if (shift >= 64) {  // >=10 continuation bytes: malformed varint
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "varint too long");
        return nullptr;
      }
      v |= static_cast<uint64_t>(b & 0x7F) << shift;
      if (!(b & 0x80)) { terminated = true; break; }
      shift += 7;
    }
    if (!terminated) {  // buffer ended inside a varint
      PyBuffer_Release(&buf);
      PyErr_SetString(PyExc_ValueError, "truncated varint");
      return nullptr;
    }
    values.push_back(v);
  }
  PyBuffer_Release(&buf);

  PyObject* out = PyList_New(values.size());
  if (!out) return nullptr;
  for (size_t i = 0; i < values.size(); ++i) {
    PyObject* num = PyLong_FromUnsignedLongLong(values[i]);
    if (!num) {
      Py_DECREF(out);
      return nullptr;
    }
    PyList_SET_ITEM(out, i, num);
  }
  return out;
}

// ---------------------------------------------------------------------------
// PGHI heap integration (Prusa, Balazs, Sondergaard 2017).
//
// The phase-gradient estimates (tgrad/fgrad, from the log-magnitude) are
// computed vectorized in numpy; this kernel runs the inherently
// sequential part — integrate the gradients outward from the
// largest-magnitude bins via a max-heap — at C speed (a full song is
// ~1M bins; the Python-heapq fallback in ops/stft.py takes seconds).
// ---------------------------------------------------------------------------

class MaxHeap {
 public:
  MaxHeap(const float* key, size_t cap) : key_(key) { items_.reserve(cap); }
  bool empty() const { return items_.empty(); }
  void push(int64_t idx) {
    items_.push_back(idx);
    size_t i = items_.size() - 1;
    while (i > 0) {
      size_t parent = (i - 1) / 2;
      if (key_[items_[parent]] >= key_[items_[i]]) break;
      std::swap(items_[parent], items_[i]);
      i = parent;
    }
  }
  int64_t pop() {
    int64_t top = items_[0];
    items_[0] = items_.back();
    items_.pop_back();
    size_t i = 0, n = items_.size();
    while (true) {
      size_t l = 2 * i + 1, r = l + 1, best = i;
      if (l < n && key_[items_[l]] > key_[items_[best]]) best = l;
      if (r < n && key_[items_[r]] > key_[items_[best]]) best = r;
      if (best == i) break;
      std::swap(items_[best], items_[i]);
      i = best;
    }
    return top;
  }

 private:
  const float* key_;
  std::vector<int64_t> items_;
};

// pghi_heap(S: bytes f32[n*nb], tgrad: bytes, fgrad: bytes,
//           n: int, nb: int, tol: float) -> bytes f32[n*nb] (phase)
PyObject* py_pghi_heap(PyObject*, PyObject* args) {
  Py_buffer s_buf, t_buf, f_buf;
  Py_ssize_t n, nb;
  double tol;
  if (!PyArg_ParseTuple(args, "y*y*y*nnd", &s_buf, &t_buf, &f_buf, &n, &nb,
                        &tol)) {
    return nullptr;
  }
  const int64_t total = static_cast<int64_t>(n) * nb;
  if (s_buf.len < static_cast<Py_ssize_t>(total * sizeof(float)) ||
      t_buf.len != s_buf.len || f_buf.len != s_buf.len) {
    PyBuffer_Release(&s_buf);
    PyBuffer_Release(&t_buf);
    PyBuffer_Release(&f_buf);
    PyErr_SetString(PyExc_ValueError, "pghi_heap: buffer size mismatch");
    return nullptr;
  }
  const float* S = static_cast<const float*>(s_buf.buf);
  const float* tgrad = static_cast<const float*>(t_buf.buf);
  const float* fgrad = static_cast<const float*>(f_buf.buf);

  PyObject* out_bytes =
      PyBytes_FromStringAndSize(nullptr, total * sizeof(float));
  if (!out_bytes) {
    PyBuffer_Release(&s_buf);
    PyBuffer_Release(&t_buf);
    PyBuffer_Release(&f_buf);
    return nullptr;
  }
  float* phase = reinterpret_cast<float*>(PyBytes_AS_STRING(out_bytes));
  std::memset(phase, 0, total * sizeof(float));

  float maxval = 0.0f;
  for (int64_t i = 0; i < total; ++i) maxval = std::max(maxval, S[i]);
  const float thresh = static_cast<float>(tol) * maxval;

  std::vector<uint8_t> done(total);
  int64_t remaining = 0;
  for (int64_t i = 0; i < total; ++i) {
    done[i] = S[i] <= thresh;  // insignificant bins keep phase 0
    remaining += !done[i];
  }
  // Seeds for disconnected regions: walk bins in magnitude order.
  std::vector<int64_t> order(total);
  for (int64_t i = 0; i < total; ++i) order[i] = i;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return S[a] > S[b]; });
  size_t seed_pos = 0;

  MaxHeap heap(S, 4096);
  while (remaining > 0) {
    while (seed_pos < order.size() && done[order[seed_pos]]) ++seed_pos;
    if (seed_pos >= order.size()) break;
    const int64_t seed = order[seed_pos];
    phase[seed] = 0.0f;
    done[seed] = 1;
    --remaining;
    heap.push(seed);
    while (!heap.empty()) {
      const int64_t idx = heap.pop();
      const int64_t i = idx / nb, j = idx % nb;
      // Trapezoidal integration to each not-done neighbor.
      if (i + 1 < n && !done[idx + nb]) {
        phase[idx + nb] = phase[idx] + 0.5f * (tgrad[idx] + tgrad[idx + nb]);
        done[idx + nb] = 1;
        --remaining;
        heap.push(idx + nb);
      }
      if (i > 0 && !done[idx - nb]) {
        phase[idx - nb] = phase[idx] - 0.5f * (tgrad[idx] + tgrad[idx - nb]);
        done[idx - nb] = 1;
        --remaining;
        heap.push(idx - nb);
      }
      if (j + 1 < nb && !done[idx + 1]) {
        phase[idx + 1] = phase[idx] + 0.5f * (fgrad[idx] + fgrad[idx + 1]);
        done[idx + 1] = 1;
        --remaining;
        heap.push(idx + 1);
      }
      if (j > 0 && !done[idx - 1]) {
        phase[idx - 1] = phase[idx] - 0.5f * (fgrad[idx] + fgrad[idx - 1]);
        done[idx - 1] = 1;
        --remaining;
        heap.push(idx - 1);
      }
    }
  }
  PyBuffer_Release(&s_buf);
  PyBuffer_Release(&t_buf);
  PyBuffer_Release(&f_buf);
  return out_bytes;
}

PyMethodDef kMethods[] = {
    {"masked_crc32c", py_masked_crc32c, METH_VARARGS,
     "TFRecord masked CRC32C of a bytes object."},
    {"split_tfrecords", py_split_tfrecords, METH_VARARGS,
     "Split a TFRecord file buffer into a list of record payloads."},
    {"decode_varints", py_decode_varints, METH_VARARGS,
     "Decode a packed protobuf varint run into a list of ints."},
    {"pghi_heap", py_pghi_heap, METH_VARARGS,
     "Phase Gradient Heap Integration over a magnitude spectrogram."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_msd_native",
    "Native data-path kernels (TFRecord framing, CRC32C, varints).",
    -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__msd_native() { return PyModule_Create(&kModule); }
