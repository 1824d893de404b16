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

PyMethodDef kMethods[] = {
    {"masked_crc32c", py_masked_crc32c, METH_VARARGS,
     "TFRecord masked CRC32C of a bytes object."},
    {"split_tfrecords", py_split_tfrecords, METH_VARARGS,
     "Split a TFRecord file buffer into a list of record payloads."},
    {"decode_varints", py_decode_varints, METH_VARARGS,
     "Decode a packed protobuf varint run into a list of ints."},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_msd_native",
    "Native data-path kernels (TFRecord framing, CRC32C, varints).",
    -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__msd_native() { return PyModule_Create(&kModule); }
