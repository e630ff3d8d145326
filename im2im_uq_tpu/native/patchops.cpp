// Native host-side patch ops for the TEMCA streaming pipeline.
//
// The reference's data tier is pure Python (SURVEY.md §2: no native code
// anywhere); its patch extraction walks 2048^2 EM tiles per epoch in
// Python/numpy (reference: core/datasets/temca/TEMCADataset.py:64-92).
// This extension implements the per-byte hot loops natively so the host
// can keep a TPU fed:
//
//   extract_patches(img u8[H,W], ph, pw, zero_frac) -> u8[N,ph,pw]
//       grid-slice + reject patches with zero-count >= zero_frac*area
//       (same keep condition as the reference, TEMCADataset.py:74)
//   make_pair(patch u8[ph,pw], d0, d1, mode) -> (f32[ph,pw,1], f32[ph,pw,1])
//       fused normalize ('01' / '-11' / none) + strided downsample +
//       nearest-upsample-back, bit-identical to the numpy path
//       (im2im_uq_tpu/data/temca.py nearest_upsample + __iter__).
//
// Build: python -m im2im_uq_tpu.native (see native/__init__.py). The
// Python pipeline falls back to numpy when the extension is absent.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cstdint>
#include <cstring>
#include <utility>
#include <vector>

namespace {

// SWAR zero-byte count: bytes equal to 0 set their 0x80 marker bit in
// (v - 0x01..) & ~v & 0x80.., popcount gives the count — 8 bytes/iteration.
inline long count_zero_bytes(const uint8_t* s, npy_intp n) {
  long total = 0;
  npy_intp j = 0;
  for (; j + 8 <= n; j += 8) {
    uint64_t v;
    std::memcpy(&v, s + j, 8);
    uint64_t t = (v - 0x0101010101010101ULL) & ~v & 0x8080808080808080ULL;
    total += __builtin_popcountll(t);
  }
  for (; j < n; ++j) total += (s[j] == 0);
  return total;
}

PyObject* extract_patches(PyObject*, PyObject* args) {
  PyArrayObject* img;
  int ph, pw;
  double zero_frac;
  if (!PyArg_ParseTuple(args, "O!iid", &PyArray_Type, &img, &ph, &pw,
                        &zero_frac))
    return nullptr;
  if (PyArray_NDIM(img) != 2 || PyArray_TYPE(img) != NPY_UINT8 ||
      !PyArray_IS_C_CONTIGUOUS(img)) {
    PyErr_SetString(PyExc_ValueError, "img must be 2-D C-contiguous uint8");
    return nullptr;
  }
  const npy_intp H = PyArray_DIM(img, 0);
  const npy_intp W = PyArray_DIM(img, 1);
  const uint8_t* data = static_cast<const uint8_t*>(PyArray_DATA(img));
  const npy_intp rows = H / ph;
  const npy_intp cols = W / pw;
  const long threshold = static_cast<long>(zero_frac * double(ph) * double(pw));

  std::vector<std::pair<npy_intp, npy_intp>> keep;
  keep.reserve(size_t(rows * cols));
  Py_BEGIN_ALLOW_THREADS
  for (npy_intp r = 0; r < rows; ++r) {
    for (npy_intp c = 0; c < cols; ++c) {
      long zeros = 0;
      for (npy_intp i = 0; i < ph; ++i)
        zeros += count_zero_bytes(data + (r * ph + i) * W + c * pw, pw);
      // keep unless >= zero_frac of the pixels are zero
      if (zeros < threshold) keep.emplace_back(r, c);
    }
  }
  Py_END_ALLOW_THREADS

  npy_intp dims[3] = {npy_intp(keep.size()), ph, pw};
  PyObject* out = PyArray_SimpleNew(3, dims, NPY_UINT8);
  if (!out) return nullptr;
  uint8_t* od = static_cast<uint8_t*>(PyArray_DATA((PyArrayObject*)out));
  Py_BEGIN_ALLOW_THREADS
  for (size_t k = 0; k < keep.size(); ++k) {
    const npy_intp r = keep[k].first, c = keep[k].second;
    for (npy_intp i = 0; i < ph; ++i) {
      std::memcpy(od + (npy_intp(k) * ph + i) * pw,
                  data + (r * ph + i) * W + c * pw, size_t(pw));
    }
  }
  Py_END_ALLOW_THREADS
  return out;
}

PyObject* make_pair(PyObject*, PyObject* args) {
  PyArrayObject* patch;
  int d0, d1, mode;  // mode: 0 -> '01', 1 -> '-11', 2 -> none
  if (!PyArg_ParseTuple(args, "O!iii", &PyArray_Type, &patch, &d0, &d1, &mode))
    return nullptr;
  if (PyArray_NDIM(patch) != 2 || PyArray_TYPE(patch) != NPY_UINT8 ||
      !PyArray_IS_C_CONTIGUOUS(patch)) {
    PyErr_SetString(PyExc_ValueError, "patch must be 2-D C-contiguous uint8");
    return nullptr;
  }
  const npy_intp ph = PyArray_DIM(patch, 0);
  const npy_intp pw = PyArray_DIM(patch, 1);
  const uint8_t* p = static_cast<const uint8_t*>(PyArray_DATA(patch));

  npy_intp dims[3] = {ph, pw, 1};
  PyObject* high = PyArray_SimpleNew(3, dims, NPY_FLOAT32);
  PyObject* low = PyArray_SimpleNew(3, dims, NPY_FLOAT32);
  if (!high || !low) {
    Py_XDECREF(high);
    Py_XDECREF(low);
    return nullptr;
  }
  float* hd = static_cast<float*>(PyArray_DATA((PyArrayObject*)high));
  float* ld = static_cast<float*>(PyArray_DATA((PyArrayObject*)low));

  Py_BEGIN_ALLOW_THREADS
  // normalization lookup table: 256 entries beat per-pixel float math
  float lut[256];
  for (int v = 0; v < 256; ++v) {
    float f = float(v);
    if (mode == 0) f = f / 255.0f;
    else if (mode == 1) f = 2.0f * (f / 255.0f - 0.5f);
    lut[v] = f;
  }
  for (npy_intp i = 0; i < ph; ++i)
    for (npy_intp j = 0; j < pw; ++j) hd[i * pw + j] = lut[p[i * pw + j]];

  // low-res: strided sample then nearest upsample back, matching
  // x[i*h//ph, j*w//pw] over x = gt[::d0, ::d1] with h = ceil(ph/d0).
  // hoist the per-column source indices out of the pixel loop.
  const npy_intp hsmall = (ph + d0 - 1) / d0;
  const npy_intp wsmall = (pw + d1 - 1) / d1;
  std::vector<npy_intp> sj{};
  sj.resize(size_t(pw));
  for (npy_intp j = 0; j < pw; ++j) sj[size_t(j)] = (j * wsmall / pw) * d1;
  for (npy_intp i = 0; i < ph; ++i) {
    const float* src = hd + (i * hsmall / ph) * d0 * pw;
    float* dst = ld + i * pw;
    for (npy_intp j = 0; j < pw; ++j) dst[j] = src[sj[size_t(j)]];
  }
  Py_END_ALLOW_THREADS
  return Py_BuildValue("(NN)", low, high);
}

PyMethodDef methods[] = {
    {"extract_patches", extract_patches, METH_VARARGS,
     "grid-slice a uint8 tile into patches, rejecting zero-heavy ones"},
    {"make_pair", make_pair, METH_VARARGS,
     "fused normalize + downsample/upsample (low, high) pair from a patch"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_patchops",
                      "native TEMCA patch ops", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__patchops(void) {
  import_array();
  return PyModule_Create(&module);
}
