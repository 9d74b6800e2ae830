// Host-side box ops as a CPython C++ extension.
//
// Native counterpart of the reference's compiled host paths: the Cython IoU
// matrix `bbox_overlaps` (lib/model/utils/bbox.pyx:15-55, shipped as ~8.6k
// lines of generated C) and the greedy CPU NMS (lib/model/nms/nms_cpu.py +
// the roi_crop C fallback family). Used by the evaluation driver and data
// tooling where the arrays live on host anyway; the accelerator path uses
// the XLA kernels in tllod_tpu/ops.
//
// Both functions use the legacy "+1" box convention the reference's metrics
// depend on. Built via setup.py (setuptools Extension, no pybind11).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// Minimal buffer-protocol view over a contiguous float32 2-D array.
struct F32Matrix {
  Py_buffer view{};
  const float* data = nullptr;
  Py_ssize_t rows = 0, cols = 0;
  bool ok = false;

  explicit F32Matrix(PyObject* obj, Py_ssize_t expect_cols) {
    if (PyObject_GetBuffer(obj, &view,
                           PyBUF_ND | PyBUF_FORMAT | PyBUF_C_CONTIGUOUS)) {
      return;
    }
    if (view.ndim != 2 || !view.format || std::strcmp(view.format, "f") ||
        view.shape[1] != expect_cols) {
      PyErr_SetString(PyExc_ValueError,
                      "expected a C-contiguous float32 array of shape "
                      "(N, k) with the right number of columns");
      PyBuffer_Release(&view);
      return;
    }
    data = static_cast<const float*>(view.buf);
    rows = view.shape[0];
    cols = view.shape[1];
    ok = true;
  }
  ~F32Matrix() {
    if (ok) PyBuffer_Release(&view);
  }
};

// bbox_overlaps(boxes (N,4) f32, query (K,4) f32) -> bytes holding (N,K) f32
// IoU matrix ("+1" areas). Returned as a bytes object the python wrapper
// wraps with numpy.frombuffer (avoids a hard numpy C-API dependency).
PyObject* bbox_overlaps(PyObject*, PyObject* args) {
  PyObject *boxes_obj, *query_obj;
  if (!PyArg_ParseTuple(args, "OO", &boxes_obj, &query_obj)) return nullptr;

  F32Matrix boxes(boxes_obj, 4);
  if (!boxes.ok) return nullptr;
  F32Matrix query(query_obj, 4);
  if (!query.ok) return nullptr;

  const Py_ssize_t n = boxes.rows, k = query.rows;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, n * k * sizeof(float));
  if (!out) return nullptr;
  float* o = reinterpret_cast<float*>(PyBytes_AsString(out));

  std::vector<float> qarea(static_cast<size_t>(k));
  for (Py_ssize_t j = 0; j < k; ++j) {
    const float* q = query.data + 4 * j;
    qarea[j] = (q[2] - q[0] + 1.f) * (q[3] - q[1] + 1.f);
  }
  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; ++i) {
    const float* b = boxes.data + 4 * i;
    const float barea = (b[2] - b[0] + 1.f) * (b[3] - b[1] + 1.f);
    float* row = o + i * k;
    for (Py_ssize_t j = 0; j < k; ++j) {
      const float* q = query.data + 4 * j;
      const float iw = std::min(b[2], q[2]) - std::max(b[0], q[0]) + 1.f;
      if (iw <= 0.f) { row[j] = 0.f; continue; }
      const float ih = std::min(b[3], q[3]) - std::max(b[1], q[1]) + 1.f;
      if (ih <= 0.f) { row[j] = 0.f; continue; }
      const float inter = iw * ih;
      row[j] = inter / (barea + qarea[j] - inter);
    }
  }
  Py_END_ALLOW_THREADS
  return out;
}

// nms(dets (N,5) f32 [x1,y1,x2,y2,score], thresh) -> list[int] keep indices
// (greedy, identical selections to lib/model/nms/nms_cpu.py:6-36).
PyObject* nms(PyObject*, PyObject* args) {
  PyObject* dets_obj;
  double thresh;
  if (!PyArg_ParseTuple(args, "Od", &dets_obj, &thresh)) return nullptr;

  F32Matrix dets(dets_obj, 5);
  if (!dets.ok) return nullptr;
  const Py_ssize_t n = dets.rows;

  std::vector<int64_t> order(static_cast<size_t>(n));
  std::vector<float> area(static_cast<size_t>(n));
  std::vector<char> suppressed(static_cast<size_t>(n), 0);
  std::vector<int64_t> keep;
  keep.reserve(static_cast<size_t>(n));

  Py_BEGIN_ALLOW_THREADS
  for (Py_ssize_t i = 0; i < n; ++i) {
    order[i] = i;
    const float* d = dets.data + 5 * i;
    area[i] = (d[2] - d[0] + 1.f) * (d[3] - d[1] + 1.f);
  }
  std::stable_sort(order.begin(), order.end(), [&](int64_t a, int64_t b) {
    return dets.data[5 * a + 4] > dets.data[5 * b + 4];
  });
  for (size_t oi = 0; oi < order.size(); ++oi) {
    const int64_t i = order[oi];
    if (suppressed[i]) continue;
    keep.push_back(i);
    const float* di = dets.data + 5 * i;
    for (size_t oj = oi + 1; oj < order.size(); ++oj) {
      const int64_t j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets.data + 5 * j;
      const float iw = std::min(di[2], dj[2]) - std::max(di[0], dj[0]) + 1.f;
      if (iw <= 0.f) continue;
      const float ih = std::min(di[3], dj[3]) - std::max(di[1], dj[1]) + 1.f;
      if (ih <= 0.f) continue;
      const float inter = iw * ih;
      if (inter / (area[i] + area[j] - inter) > thresh) suppressed[j] = 1;
    }
  }
  Py_END_ALLOW_THREADS

  PyObject* out = PyList_New(static_cast<Py_ssize_t>(keep.size()));
  if (!out) return nullptr;
  for (size_t i = 0; i < keep.size(); ++i) {
    PyList_SET_ITEM(out, static_cast<Py_ssize_t>(i),
                    PyLong_FromLongLong(keep[i]));
  }
  return out;
}

PyMethodDef kMethods[] = {
    {"bbox_overlaps", bbox_overlaps, METH_VARARGS,
     "IoU matrix (bytes of f32, shape N*K) with the '+1' convention"},
    {"nms", nms, METH_VARARGS, "greedy NMS keep indices"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_native",
                       "tllod host-side native box ops", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__native() { return PyModule_Create(&kModule); }
