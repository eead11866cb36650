// Native runtime support for volprim_tpu.
//
// The reference offloads its data path to C++ inside Mitsuba/Dr.Jit: PLY
// parsing of multi-million-primitive 3DGS files and acceleration-structure
// builds (SURVEY.md §2.3). This extension provides the TPU framework's
// equivalents as a CPython extension module (no pybind11 in the image):
//
//   parse_ply(path)          -> (names, float32 column matrix [N, P])
//       mmap-free threaded parser for binary_little_endian vertex tables
//       (de-interleaves the AoS record into SoA columns in parallel).
//   morton_codes(centers)    -> uint32 [N] 30-bit Morton codes
//   radix_argsort(keys)      -> uint32 [N] permutation (LSD radix, threaded
//       histogram), used for the Morton cluster build at scene load.
//
// Python fallbacks exist for every entry point (scene/ply.py,
// accel/clusters.py); this module is an acceleration, not a dependency.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <thread>
#include <vector>

namespace {

struct PlyProperty {
  std::string name;
  size_t size;    // bytes
  char kind;      // 'f' f32, 'd' f64, 'b'/'B' i8/u8, 'h'/'H' i16/u16,
                  // 'i'/'I' i32/u32 (struct-format letters; signedness kept
                  // so e.g. negative int8 columns convert correctly)
};

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n == 0 ? 4 : static_cast<int>(n);
}

// ---------------------------------------------------------------------------
// parse_ply
// ---------------------------------------------------------------------------

PyObject* parse_ply(PyObject*, PyObject* args) {
  const char* path = nullptr;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  std::ifstream f(path, std::ios::binary);
  if (!f) {
    PyErr_Format(PyExc_FileNotFoundError, "cannot open %s", path);
    return nullptr;
  }

  std::string line;
  std::getline(f, line);
  if (line.rfind("ply", 0) != 0) {
    PyErr_SetString(PyExc_ValueError, "not a PLY file");
    return nullptr;
  }

  bool binary_le = false;
  bool in_vertex = false;
  long long count = -1;
  std::vector<PlyProperty> props;

  while (std::getline(f, line)) {
    // strip trailing \r
    while (!line.empty() && (line.back() == '\r' || line.back() == '\n'))
      line.pop_back();
    if (line == "end_header") break;
    if (line.rfind("format", 0) == 0) {
      binary_le = line.find("binary_little_endian") != std::string::npos;
    } else if (line.rfind("element", 0) == 0) {
      in_vertex = line.find("vertex") != std::string::npos;
      if (in_vertex) {
        size_t pos = line.rfind(' ');
        count = std::stoll(line.substr(pos + 1));
      }
    } else if (line.rfind("property", 0) == 0 && in_vertex) {
      // "property <type> <name>"
      size_t p1 = line.find(' ');
      size_t p2 = line.find(' ', p1 + 1);
      std::string type = line.substr(p1 + 1, p2 - p1 - 1);
      std::string name = line.substr(p2 + 1);
      PlyProperty prop;
      prop.name = name;
      if (type == "float" || type == "float32") { prop.size = 4; prop.kind = 'f'; }
      else if (type == "double" || type == "float64") { prop.size = 8; prop.kind = 'd'; }
      else if (type == "char" || type == "int8") { prop.size = 1; prop.kind = 'b'; }
      else if (type == "uchar" || type == "uint8") { prop.size = 1; prop.kind = 'B'; }
      else if (type == "short" || type == "int16") { prop.size = 2; prop.kind = 'h'; }
      else if (type == "ushort" || type == "uint16") { prop.size = 2; prop.kind = 'H'; }
      else if (type == "int" || type == "int32") { prop.size = 4; prop.kind = 'i'; }
      else if (type == "uint" || type == "uint32") { prop.size = 4; prop.kind = 'I'; }
      else {
        PyErr_Format(PyExc_ValueError, "unsupported PLY property type %s", type.c_str());
        return nullptr;
      }
      props.push_back(prop);
    }
  }
  if (!binary_le || count < 0) {
    PyErr_SetString(PyExc_ValueError,
                    "only binary_little_endian vertex PLY supported natively");
    return nullptr;
  }

  size_t stride = 0;
  for (auto& p : props) stride += p.size;
  const size_t n = static_cast<size_t>(count);
  const size_t np = props.size();

  std::streampos data_start = f.tellg();
  std::vector<char> raw(stride * n);
  f.read(raw.data(), static_cast<std::streamsize>(raw.size()));
  if (static_cast<size_t>(f.gcount()) != raw.size()) {
    PyErr_SetString(PyExc_ValueError, "truncated PLY payload");
    return nullptr;
  }
  (void)data_start;

  // output: float32 matrix [np, n] (column-major per property)
  PyObject* bytes = PyBytes_FromStringAndSize(nullptr,
      static_cast<Py_ssize_t>(sizeof(float) * np * n));
  if (!bytes) return nullptr;
  float* out = reinterpret_cast<float*>(PyBytes_AS_STRING(bytes));

  std::vector<size_t> offsets(np);
  {
    size_t off = 0;
    for (size_t j = 0; j < np; ++j) { offsets[j] = off; off += props[j].size; }
  }

  int nt = hardware_threads();
  std::vector<std::thread> threads;
  size_t chunk = (n + nt - 1) / nt;
  Py_BEGIN_ALLOW_THREADS
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t]() {
      size_t lo = t * chunk;
      size_t hi = std::min(n, lo + chunk);
      for (size_t i = lo; i < hi; ++i) {
        const char* rec = raw.data() + i * stride;
        for (size_t j = 0; j < np; ++j) {
          const char* src = rec + offsets[j];
          float v;
          switch (props[j].kind) {
            case 'f': { float x; std::memcpy(&x, src, 4); v = x; break; }
            case 'd': { double x; std::memcpy(&x, src, 8); v = static_cast<float>(x); break; }
            case 'b': { int8_t x; std::memcpy(&x, src, 1); v = static_cast<float>(x); break; }
            case 'B': { uint8_t x; std::memcpy(&x, src, 1); v = static_cast<float>(x); break; }
            case 'h': { int16_t x; std::memcpy(&x, src, 2); v = static_cast<float>(x); break; }
            case 'H': { uint16_t x; std::memcpy(&x, src, 2); v = static_cast<float>(x); break; }
            case 'i': { int32_t x; std::memcpy(&x, src, 4); v = static_cast<float>(x); break; }
            default: { uint32_t x; std::memcpy(&x, src, 4); v = static_cast<float>(x); break; }
          }
          out[j * n + i] = v;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  Py_END_ALLOW_THREADS

  PyObject* names = PyList_New(static_cast<Py_ssize_t>(np));
  for (size_t j = 0; j < np; ++j) {
    PyList_SET_ITEM(names, static_cast<Py_ssize_t>(j),
                    PyUnicode_FromString(props[j].name.c_str()));
  }
  PyObject* result = Py_BuildValue("(NNnn)", names, bytes,
                                   static_cast<Py_ssize_t>(np),
                                   static_cast<Py_ssize_t>(n));
  return result;
}

// ---------------------------------------------------------------------------
// morton_codes + radix_argsort
// ---------------------------------------------------------------------------

inline uint32_t spread10(uint32_t x) {
  x &= 0x3FFu;
  x = (x | (x << 16)) & 0x30000FFu;
  x = (x | (x << 8)) & 0x300F00Fu;
  x = (x | (x << 4)) & 0x30C30C3u;
  x = (x | (x << 2)) & 0x9249249u;
  return x;
}

PyObject* morton_codes(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  if (buf.len % (3 * sizeof(float)) != 0) {
    PyBuffer_Release(&buf);
    PyErr_SetString(PyExc_ValueError, "expected flat float32 [N*3] centers");
    return nullptr;
  }
  size_t n = buf.len / (3 * sizeof(float));
  const float* c = reinterpret_cast<const float*>(buf.buf);

  float lo[3] = {1e30f, 1e30f, 1e30f}, hi[3] = {-1e30f, -1e30f, -1e30f};
  for (size_t i = 0; i < n; ++i)
    for (int k = 0; k < 3; ++k) {
      float v = c[3 * i + k];
      lo[k] = std::min(lo[k], v);
      hi[k] = std::max(hi[k], v);
    }
  float inv[3];
  for (int k = 0; k < 3; ++k) {
    float d = hi[k] - lo[k];
    inv[k] = d > 1e-8f ? 1023.0f / d : 0.0f;
  }

  PyObject* bytes = PyBytes_FromStringAndSize(nullptr,
      static_cast<Py_ssize_t>(sizeof(uint32_t) * n));
  if (!bytes) { PyBuffer_Release(&buf); return nullptr; }
  uint32_t* out = reinterpret_cast<uint32_t*>(PyBytes_AS_STRING(bytes));

  Py_BEGIN_ALLOW_THREADS
  int nt = hardware_threads();
  std::vector<std::thread> threads;
  size_t chunk = (n + nt - 1) / nt;
  for (int t = 0; t < nt; ++t) {
    threads.emplace_back([&, t]() {
      size_t a = t * chunk, b = std::min(n, a + chunk);
      for (size_t i = a; i < b; ++i) {
        uint32_t q[3];
        for (int k = 0; k < 3; ++k) {
          float v = (c[3 * i + k] - lo[k]) * inv[k];
          v = std::max(0.0f, std::min(1023.0f, v));
          q[k] = static_cast<uint32_t>(v);
        }
        out[i] = spread10(q[0]) | (spread10(q[1]) << 1) | (spread10(q[2]) << 2);
      }
    });
  }
  for (auto& th : threads) th.join();
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&buf);
  return bytes;
}

PyObject* radix_argsort(PyObject*, PyObject* args) {
  Py_buffer buf;
  if (!PyArg_ParseTuple(args, "y*", &buf)) return nullptr;
  size_t n = buf.len / sizeof(uint32_t);
  const uint32_t* keys = reinterpret_cast<const uint32_t*>(buf.buf);

  PyObject* bytes = PyBytes_FromStringAndSize(nullptr,
      static_cast<Py_ssize_t>(sizeof(uint32_t) * n));
  if (!bytes) { PyBuffer_Release(&buf); return nullptr; }
  uint32_t* out = reinterpret_cast<uint32_t*>(PyBytes_AS_STRING(bytes));

  Py_BEGIN_ALLOW_THREADS
  std::vector<uint32_t> idx(n), tmp(n), key0(keys, keys + n), key1(n);
  for (size_t i = 0; i < n; ++i) idx[i] = static_cast<uint32_t>(i);
  // LSD radix over 4 bytes
  for (int pass = 0; pass < 4; ++pass) {
    size_t hist[257] = {0};
    int shift = pass * 8;
    for (size_t i = 0; i < n; ++i) hist[((key0[i] >> shift) & 0xFF) + 1]++;
    for (int b = 0; b < 256; ++b) hist[b + 1] += hist[b];
    for (size_t i = 0; i < n; ++i) {
      size_t pos = hist[(key0[i] >> shift) & 0xFF]++;
      tmp[pos] = idx[i];
      key1[pos] = key0[i];
    }
    idx.swap(tmp);
    key0.swap(key1);
  }
  std::memcpy(out, idx.data(), sizeof(uint32_t) * n);
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&buf);
  return bytes;
}

PyMethodDef methods[] = {
    {"parse_ply", parse_ply, METH_VARARGS,
     "parse_ply(path) -> (names, float32_bytes, n_props, n_verts)"},
    {"morton_codes", morton_codes, METH_VARARGS,
     "morton_codes(float32_centers_bytes) -> uint32_bytes"},
    {"radix_argsort", radix_argsort, METH_VARARGS,
     "radix_argsort(uint32_keys_bytes) -> uint32_perm_bytes"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "volprim_native",
    "Native data-path support for volprim_tpu", -1, methods,
    nullptr, nullptr, nullptr, nullptr,
};

}  // namespace

PyMODINIT_FUNC PyInit_volprim_native() { return PyModule_Create(&module); }
