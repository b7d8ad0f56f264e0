// Native host-side kernels for street_crafter_tpu.
//
// Replaces the runtime roles of the reference's C++/CUDA host utilities that
// are not TPU compute: binary PLY parsing (open3d/easyvolcap io), voxel
// downsampling and radius-outlier removal (open3d geometry ops used at scene
// init on ~1e6-point LiDAR aggregates, base_processor.py:82-88). The TPU
// compute path (rasterizers, attention) lives in XLA/Pallas; this module
// keeps the CPU data path native too.
//
// Built as a plain CPython extension (no pybind11 in this image):
//   python -m street_crafter_tpu.native.build

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// PLY reading
// ---------------------------------------------------------------------------

struct Property {
  std::string name;
  int size;      // bytes
  char kind;     // 'f' float, 'i' int, 'u' uint
};

int type_info(const std::string& t, Property* p) {
  if (t == "float" || t == "float32") { p->size = 4; p->kind = 'f'; }
  else if (t == "double" || t == "float64") { p->size = 8; p->kind = 'f'; }
  else if (t == "char" || t == "int8") { p->size = 1; p->kind = 'i'; }
  else if (t == "uchar" || t == "uint8") { p->size = 1; p->kind = 'u'; }
  else if (t == "short" || t == "int16") { p->size = 2; p->kind = 'i'; }
  else if (t == "ushort" || t == "uint16") { p->size = 2; p->kind = 'u'; }
  else if (t == "int" || t == "int32") { p->size = 4; p->kind = 'i'; }
  else if (t == "uint" || t == "uint32") { p->size = 4; p->kind = 'u'; }
  else return -1;
  return 0;
}

double read_scalar(const char* ptr, const Property& p) {
  switch (p.kind) {
    case 'f':
      if (p.size == 4) { float v; std::memcpy(&v, ptr, 4); return v; }
      else { double v; std::memcpy(&v, ptr, 8); return v; }
    case 'i':
      if (p.size == 1) { int8_t v; std::memcpy(&v, ptr, 1); return v; }
      else if (p.size == 2) { int16_t v; std::memcpy(&v, ptr, 2); return v; }
      else { int32_t v; std::memcpy(&v, ptr, 4); return v; }
    default:
      if (p.size == 1) { uint8_t v; std::memcpy(&v, ptr, 1); return v; }
      else if (p.size == 2) { uint16_t v; std::memcpy(&v, ptr, 2); return v; }
      else { uint32_t v; std::memcpy(&v, ptr, 4); return v; }
  }
}

// read_ply(path) -> (points[N,3] f32, colors[N,3] f32 | None, mask[N] bool | None)
PyObject* py_read_ply(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  FILE* f = fopen(path, "rb");
  if (!f) { PyErr_SetString(PyExc_FileNotFoundError, path); return nullptr; }

  char line[4096];
  bool binary_le = false, in_vertex = false;
  long n_vertex = 0;
  std::vector<Property> props;
  if (!fgets(line, sizeof line, f) || std::strncmp(line, "ply", 3) != 0) {
    fclose(f);
    PyErr_SetString(PyExc_ValueError, "not a PLY file");
    return nullptr;
  }
  while (fgets(line, sizeof line, f)) {
    std::string s(line);
    if (s.rfind("end_header", 0) == 0) break;
    if (s.rfind("format", 0) == 0) {
      binary_le = s.find("binary_little_endian") != std::string::npos;
      if (!binary_le) { fclose(f); Py_RETURN_NONE; }  // python fallback
    } else if (s.rfind("element", 0) == 0) {
      char name[64];
      long cnt;
      if (sscanf(s.c_str(), "element %63s %ld", name, &cnt) == 2) {
        in_vertex = std::strcmp(name, "vertex") == 0;
        if (in_vertex) n_vertex = cnt;
      }
    } else if (s.rfind("property", 0) == 0 && in_vertex) {
      char type[32], name[64];
      if (sscanf(s.c_str(), "property %31s %63s", type, name) == 2) {
        if (std::strcmp(type, "list") == 0) { fclose(f); Py_RETURN_NONE; }
        Property p;
        p.name = name;
        if (type_info(type, &p) != 0) { fclose(f); Py_RETURN_NONE; }
        props.push_back(p);
      }
    }
  }

  size_t stride = 0;
  int off[6] = {-1, -1, -1, -1, -1, -1};  // x y z r g b
  int mask_off = -1;
  Property prop_of[7];
  for (auto& p : props) {
    int idx = -1;
    if (p.name == "x") idx = 0;
    else if (p.name == "y") idx = 1;
    else if (p.name == "z") idx = 2;
    else if (p.name == "red") idx = 3;
    else if (p.name == "green") idx = 4;
    else if (p.name == "blue") idx = 5;
    else if (p.name == "mask") { mask_off = (int)stride; prop_of[6] = p; }
    if (idx >= 0) { off[idx] = (int)stride; prop_of[idx] = p; }
    stride += p.size;
  }
  if (off[0] < 0 || off[1] < 0 || off[2] < 0) { fclose(f); Py_RETURN_NONE; }

  std::vector<char> buf(stride * (size_t)n_vertex);
  size_t got = fread(buf.data(), 1, buf.size(), f);
  fclose(f);
  if (got != buf.size()) {
    PyErr_SetString(PyExc_ValueError, "truncated PLY data");
    return nullptr;
  }

  npy_intp dims2[2] = {n_vertex, 3};
  PyObject* pts = PyArray_SimpleNew(2, dims2, NPY_FLOAT32);
  float* pp = (float*)PyArray_DATA((PyArrayObject*)pts);
  bool has_color = off[3] >= 0 && off[4] >= 0 && off[5] >= 0;
  PyObject* cols = Py_None;
  float* cp = nullptr;
  if (has_color) {
    cols = PyArray_SimpleNew(2, dims2, NPY_FLOAT32);
    cp = (float*)PyArray_DATA((PyArrayObject*)cols);
  }
  PyObject* mask = Py_None;
  npy_bool* mp = nullptr;
  if (mask_off >= 0) {
    npy_intp dims1[1] = {n_vertex};
    mask = PyArray_SimpleNew(1, dims1, NPY_BOOL);
    mp = (npy_bool*)PyArray_DATA((PyArrayObject*)mask);
  }

  bool color_is_byte = has_color && prop_of[3].kind == 'u'
                       && prop_of[3].size == 1;
  for (long i = 0; i < n_vertex; ++i) {
    const char* row = buf.data() + (size_t)i * stride;
    for (int k = 0; k < 3; ++k)
      pp[i * 3 + k] = (float)read_scalar(row + off[k], prop_of[k]);
    if (has_color) {
      for (int k = 0; k < 3; ++k) {
        double v = read_scalar(row + off[3 + k], prop_of[3 + k]);
        cp[i * 3 + k] = (float)(color_is_byte ? v / 255.0 : v);
      }
    }
    if (mp) mp[i] = read_scalar(row + mask_off, prop_of[6]) != 0.0;
  }
  // float-typed colors may still be 0..255
  if (has_color && !color_is_byte) {
    float mx = 0.f;
    for (long i = 0; i < n_vertex * 3; ++i) mx = std::max(mx, cp[i]);
    if (mx > 1.0f + 1e-6f)
      for (long i = 0; i < n_vertex * 3; ++i) cp[i] /= 255.0f;
  }

  PyObject* out = Py_BuildValue("(OOO)", pts, cols, mask);
  Py_DECREF(pts);
  if (cols != Py_None) Py_DECREF(cols);
  if (mask != Py_None) Py_DECREF(mask);
  return out;
}

// ---------------------------------------------------------------------------
// Grid hashing shared by voxel downsample / outlier removal
// ---------------------------------------------------------------------------

struct Key3 {
  int64_t x, y, z;
  bool operator==(const Key3& o) const {
    return x == o.x && y == o.y && z == o.z;
  }
};
struct Key3Hash {
  size_t operator()(const Key3& k) const {
    return (size_t)(k.x * 73856093LL ^ k.y * 19349669LL ^ k.z * 83492791LL);
  }
};

// voxel_downsample(points[N,3] f32, colors[N,3] f32 | None, voxel) ->
//   (points[M,3], colors[M,3] | None)
PyObject* py_voxel_downsample(PyObject*, PyObject* args) {
  PyArrayObject *pts_o, *cols_o = nullptr;
  PyObject* cols_arg;
  double voxel;
  if (!PyArg_ParseTuple(args, "O!Od", &PyArray_Type, &pts_o, &cols_arg,
                        &voxel))
    return nullptr;
  bool has_cols = cols_arg != Py_None;
  if (has_cols) cols_o = (PyArrayObject*)cols_arg;

  PyArrayObject* pts = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)pts_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  PyArrayObject* cols = has_cols
      ? (PyArrayObject*)PyArray_FROM_OTF(
            (PyObject*)cols_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS)
      : nullptr;
  long n = (long)PyArray_DIM(pts, 0);
  const float* P = (const float*)PyArray_DATA(pts);
  const float* C = cols ? (const float*)PyArray_DATA(cols) : nullptr;

  std::unordered_map<Key3, long, Key3Hash> cell_to_idx;
  cell_to_idx.reserve((size_t)n);
  std::vector<double> acc_p, acc_c;
  std::vector<long> cnt;
  double inv = 1.0 / voxel;

  for (long i = 0; i < n; ++i) {
    Key3 k{(int64_t)std::floor(P[i * 3] * inv),
           (int64_t)std::floor(P[i * 3 + 1] * inv),
           (int64_t)std::floor(P[i * 3 + 2] * inv)};
    auto it = cell_to_idx.find(k);
    long j;
    if (it == cell_to_idx.end()) {
      j = (long)cnt.size();
      cell_to_idx.emplace(k, j);
      cnt.push_back(0);
      acc_p.insert(acc_p.end(), {0, 0, 0});
      if (C) acc_c.insert(acc_c.end(), {0, 0, 0});
    } else {
      j = it->second;
    }
    cnt[j]++;
    for (int d = 0; d < 3; ++d) acc_p[j * 3 + d] += P[i * 3 + d];
    if (C) for (int d = 0; d < 3; ++d) acc_c[j * 3 + d] += C[i * 3 + d];
  }

  long m = (long)cnt.size();
  npy_intp dims[2] = {m, 3};
  PyObject* out_p = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  float* OP = (float*)PyArray_DATA((PyArrayObject*)out_p);
  PyObject* out_c = Py_None;
  float* OC = nullptr;
  if (C) {
    out_c = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
    OC = (float*)PyArray_DATA((PyArrayObject*)out_c);
  }
  for (long j = 0; j < m; ++j)
    for (int d = 0; d < 3; ++d) {
      OP[j * 3 + d] = (float)(acc_p[j * 3 + d] / cnt[j]);
      if (OC) OC[j * 3 + d] = (float)(acc_c[j * 3 + d] / cnt[j]);
    }

  Py_DECREF(pts);
  if (cols) Py_DECREF(cols);
  PyObject* out = Py_BuildValue("(OO)", out_p, out_c);
  Py_DECREF(out_p);
  if (out_c != Py_None) Py_DECREF(out_c);
  return out;
}

// radius_outliers(points[N,3] f32, nb_points, radius) -> keep[N] bool
PyObject* py_radius_outliers(PyObject*, PyObject* args) {
  PyArrayObject* pts_o;
  long nb_points;
  double radius;
  if (!PyArg_ParseTuple(args, "O!ld", &PyArray_Type, &pts_o, &nb_points,
                        &radius))
    return nullptr;
  PyArrayObject* pts = (PyArrayObject*)PyArray_FROM_OTF(
      (PyObject*)pts_o, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS);
  long n = (long)PyArray_DIM(pts, 0);
  const float* P = (const float*)PyArray_DATA(pts);

  double inv = 1.0 / radius, r2 = radius * radius;
  std::unordered_map<Key3, std::vector<int32_t>, Key3Hash> grid;
  grid.reserve((size_t)n);
  auto key_of = [&](long i) {
    return Key3{(int64_t)std::floor(P[i * 3] * inv),
                (int64_t)std::floor(P[i * 3 + 1] * inv),
                (int64_t)std::floor(P[i * 3 + 2] * inv)};
  };
  for (long i = 0; i < n; ++i) grid[key_of(i)].push_back((int32_t)i);

  npy_intp dims[1] = {n};
  PyObject* keep = PyArray_SimpleNew(1, dims, NPY_BOOL);
  npy_bool* K = (npy_bool*)PyArray_DATA((PyArrayObject*)keep);

  Py_BEGIN_ALLOW_THREADS
  for (long i = 0; i < n; ++i) {
    Key3 k = key_of(i);
    long count = 0;
    for (int dx = -1; dx <= 1 && count <= nb_points; ++dx)
      for (int dy = -1; dy <= 1 && count <= nb_points; ++dy)
        for (int dz = -1; dz <= 1 && count <= nb_points; ++dz) {
          auto it = grid.find(Key3{k.x + dx, k.y + dy, k.z + dz});
          if (it == grid.end()) continue;
          for (int32_t j : it->second) {
            double ddx = P[i * 3] - P[j * 3];
            double ddy = P[i * 3 + 1] - P[j * 3 + 1];
            double ddz = P[i * 3 + 2] - P[j * 3 + 2];
            if (ddx * ddx + ddy * ddy + ddz * ddz <= r2) {
              if (++count > nb_points) break;
            }
          }
        }
    K[i] = count > nb_points;  // count includes self: >= nb_points+1
  }
  Py_END_ALLOW_THREADS

  Py_DECREF(pts);
  return keep;
}

PyMethodDef methods[] = {
    {"read_ply", py_read_ply, METH_VARARGS,
     "read_ply(path) -> (points, colors|None, mask|None) or None"},
    {"voxel_downsample", py_voxel_downsample, METH_VARARGS,
     "voxel_downsample(points, colors|None, voxel) -> (points, colors|None)"},
    {"radius_outliers", py_radius_outliers, METH_VARARGS,
     "radius_outliers(points, nb_points, radius) -> keep mask"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "_native",
                         "street_crafter_tpu native host kernels", -1,
                         methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
  import_array();
  return PyModule_Create(&moduledef);
}
