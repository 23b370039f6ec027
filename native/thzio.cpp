// thzio — native IO for the pigan_thz_tpu data layer.
//
// The reference's data path is pandas.read_csv on the host
// (core/utils/data_loader.py:155).  That is fine for the 1000-row research
// CSV, but this framework also targets production-scale corpora (millions of
// simulated spectra feeding screening / surrogate training).  This extension
// provides:
//
//   parse_csv(path)            -> (header: list[str], data: float32[N, C])
//       mmap'd, multi-threaded CSV float parser (rows partitioned across
//       std::thread workers; custom strtof-based field scanner).
//   write_cache(path, array)   -> binary .thzb cache (magic + shape + raw
//       little-endian float32), written with one fwrite.
//   read_cache(path)           -> float32[N, C] memcpy'd from the mmap.
//
// The Python wrapper (pigan_thz_tpu/data/native_io.py) compiles this file on
// demand with g++ and falls back to pandas when no toolchain is available.
// GIL is released during parsing.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cmath>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <thread>
#include <unistd.h>
#include <vector>

namespace {

struct MappedFile {
  const char* data = nullptr;
  size_t size = 0;
  int fd = -1;
  bool ok() const { return data != nullptr; }
  ~MappedFile() {
    if (data) munmap(const_cast<char*>(data), size);
    if (fd >= 0) close(fd);
  }
};

bool map_file(const char* path, MappedFile* out) {
  out->fd = open(path, O_RDONLY);
  if (out->fd < 0) return false;
  struct stat st;
  if (fstat(out->fd, &st) != 0 || st.st_size == 0) return false;
  void* p = mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, out->fd, 0);
  if (p == MAP_FAILED) return false;
  out->data = static_cast<const char*>(p);
  out->size = static_cast<size_t>(st.st_size);
  return true;
}

// SWAR 8-digit block parse (the fast_float / Lemire technique): load 8
// bytes little-endian, verify all are ASCII digits, and reduce them to
// their decimal value in three multiply steps instead of eight
// multiply-add iterations.
inline bool is_eight_digits(uint64_t val) {
  return ((val & 0xF0F0F0F0F0F0F0F0ULL) |
          (((val + 0x0606060606060606ULL) & 0xF0F0F0F0F0F0F0F0ULL) >> 4)) ==
         0x3333333333333333ULL;
}

inline uint32_t parse_eight_digits(uint64_t val) {
  const uint64_t mask = 0x000000FF000000FFULL;
  const uint64_t mul1 = 0x000F424000000064ULL;  // 100 + (1000000 << 32)
  const uint64_t mul2 = 0x0000271000000001ULL;  // 1 + (10000 << 32)
  val -= 0x3030303030303030ULL;
  val = (val * 10) + (val >> 8);  // pairs
  val = (((val & mask) * mul1) + (((val >> 16) & mask) * mul2)) >> 32;
  return static_cast<uint32_t>(val);
}

// Fast float scanner for the common "[-]ddd.ddd[e±dd]" CSV case; falls back
// to strtof for anything unusual (inf, nan, hex).  Mantissa digits are
// accumulated in a uint64 (integer ALU ops, SWAR blocks of 8 where
// available) instead of a double multiply-add chain; exact for <= 19
// digits, beyond which a double accumulator takes over (already past
// float32 precision anyway).
inline float scan_float(const char* p, const char* end, const char** next) {
  const char* s = p;
  bool neg = false;
  if (p < end && (*p == '-' || *p == '+')) {
    neg = (*p == '-');
    ++p;
  }
  uint64_t imant = 0;
  int digits = 0;
  while (end - p >= 8 && digits <= 11) {
    uint64_t chunk;
    memcpy(&chunk, p, 8);
    if (!is_eight_digits(chunk)) break;
    imant = imant * 100000000ULL + parse_eight_digits(chunk);
    p += 8;
    digits += 8;
  }
  while (p < end && *p >= '0' && *p <= '9') {
    imant = imant * 10 + static_cast<uint64_t>(*p - '0');
    ++p;
    ++digits;
  }
  int frac = 0;
  if (p < end && *p == '.') {
    ++p;
    while (end - p >= 8 && digits <= 11) {
      uint64_t chunk;
      memcpy(&chunk, p, 8);
      if (!is_eight_digits(chunk)) break;
      imant = imant * 100000000ULL + parse_eight_digits(chunk);
      p += 8;
      digits += 8;
      frac += 8;
    }
    while (p < end && *p >= '0' && *p <= '9') {
      imant = imant * 10 + static_cast<uint64_t>(*p - '0');
      ++p;
      ++digits;
      ++frac;
    }
  }
  double mant = static_cast<double>(imant);
  if (digits > 19) {
    // uint64 overflowed: re-scan in double (rare — scientific data rows
    // carry far fewer significant digits than 19)
    mant = 0.0;
    for (const char* q = s; q < p; ++q) {
      if (*q >= '0' && *q <= '9') mant = mant * 10.0 + (*q - '0');
    }
  }
  if (digits == 0) {  // not a plain number (empty, "nan", "inf", ...)
    // strtof needs NUL termination; the mmap may end exactly at a page
    // boundary, so copy the (short) token into a bounded local buffer.
    char buf[64];
    size_t n = static_cast<size_t>(end - s);
    if (n > sizeof(buf) - 1) n = sizeof(buf) - 1;
    memcpy(buf, s, n);
    buf[n] = '\0';
    char* e = nullptr;
    float v = strtof(buf, &e);
    if (e == buf) {
      *next = s;
      return NAN;
    }
    *next = s + (e - buf);
    return v;
  }
  int exp = -frac;
  if (p < end && (*p == 'e' || *p == 'E')) {
    const char* save = p;
    ++p;
    bool eneg = false;
    if (p < end && (*p == '-' || *p == '+')) {
      eneg = (*p == '-');
      ++p;
    }
    int ev = 0;
    int edigits = 0;
    while (p < end && *p >= '0' && *p <= '9') {
      // saturate: a huge exponent must give inf/0 via pow, not signed
      // overflow UB and an arbitrary finite value
      if (ev < 100000000) ev = ev * 10 + (*p - '0');
      ++p;
      ++edigits;
    }
    if (edigits == 0) {
      p = save;  // lone 'e' belongs to the next token
    } else {
      exp += eneg ? -ev : ev;
    }
  }
  static const double kPow10[] = {1e0, 1e1, 1e2, 1e3, 1e4, 1e5, 1e6, 1e7,
                                  1e8, 1e9, 1e10, 1e11, 1e12, 1e13, 1e14, 1e15};
  double v;
  if (exp >= 0) {
    v = exp < 16 ? mant * kPow10[exp] : mant * pow(10.0, exp);
  } else {
    int e2 = -exp;
    v = e2 < 16 ? mant / kPow10[e2] : mant / pow(10.0, e2);
  }
  *next = p;
  return static_cast<float>(neg ? -v : v);
}

// Parse one CSV line of floats into row[0..ncols); returns parsed count.
// One field per comma: an empty field ("a,,b" or a trailing comma) yields
// NaN in its own column, matching pandas (empty -> NaN, no column shift).
size_t parse_row(const char* p, const char* end, float* row, size_t ncols) {
  size_t c = 0;
  while (c < ncols) {
    while (p < end && *p == ' ') ++p;
    if (p >= end || *p == '\n' || *p == '\r') {
      break;  // line ended; caller pads remaining columns
    }
    if (*p == ',') {  // empty field
      row[c++] = NAN;
      ++p;
      continue;
    }
    const char* next = nullptr;
    float v = scan_float(p, end, &next);
    if (next == p) {  // unparseable token -> NaN, skip to delimiter
      v = NAN;
      while (next < end && *next != ',' && *next != '\n' && *next != '\r') ++next;
    }
    row[c++] = v;
    p = next;
    while (p < end && *p == ' ') ++p;
    if (p < end && *p == ',') {
      ++p;  // exactly one delimiter
    } else if (p >= end || *p == '\n' || *p == '\r') {
      break;
    } else {
      // trailing junk after a parsed number ('0x1A', '1.5abc', '1 2'):
      // the whole token is ONE non-numeric field -> NaN, and we skip to
      // the next delimiter so later columns never shift
      row[c - 1] = NAN;
      while (p < end && *p != ',' && *p != '\n' && *p != '\r') ++p;
      if (p < end && *p == ',') {
        ++p;
      } else {
        break;
      }
    }
  }
  return c;
}

struct CsvIndex {
  const char* header_begin;
  const char* header_end;
  std::vector<const char*> rows;  // start of each data line
  const char* end;
};

void index_csv(const MappedFile& mf, CsvIndex* idx) {
  // memchr rides the libc SIMD newline scan (~10x a byte loop)
  const char* p = mf.data;
  const char* end = mf.data + mf.size;
  idx->header_begin = p;
  const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
  idx->header_end = nl ? nl : end;
  p = nl ? nl + 1 : end;
  idx->rows.reserve(mf.size / 64);  // crude lower-ish bound on row count
  while (p < end) {
    if (*p != '\n' && *p != '\r') {
      nl = static_cast<const char*>(memchr(p, '\n', end - p));
      const char* le = nl ? nl : end;
      // skip whitespace-only lines like pandas skip_blank_lines (a
      // trailing '   \n' must not become an unparseable row)
      const char* q = p;
      while (q < le && (*q == ' ' || *q == '\t' || *q == '\r')) ++q;
      if (q < le) idx->rows.push_back(p);
      p = nl ? nl + 1 : end;
    } else {
      ++p;
    }
  }
  idx->end = end;
}

}  // namespace

static PyObject* thzio_parse_csv(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;

  MappedFile mf;
  if (!map_file(path, &mf)) {
    PyErr_Format(PyExc_IOError, "cannot mmap %s: %s", path, strerror(errno));
    return nullptr;
  }

  CsvIndex idx;
  std::vector<std::string> header;
  {
    Py_BEGIN_ALLOW_THREADS
    index_csv(mf, &idx);
    Py_END_ALLOW_THREADS
  }
  // split header
  {
    const char* p = idx.header_begin;
    std::string cur;
    for (; p <= idx.header_end; ++p) {
      if (p == idx.header_end || *p == ',') {
        while (!cur.empty() && (cur.back() == '\r' || cur.back() == ' '))
          cur.pop_back();
        header.push_back(cur);
        cur.clear();
      } else {
        cur.push_back(*p);
      }
    }
  }
  const size_t ncols = header.size();
  const size_t nrows = idx.rows.size();

  npy_intp dims[2] = {static_cast<npy_intp>(nrows), static_cast<npy_intp>(ncols)};
  PyObject* arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) return nullptr;
  float* out = static_cast<float*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)));

  int rc = 0;
  {
    Py_BEGIN_ALLOW_THREADS
    unsigned hw = std::thread::hardware_concurrency();
    size_t nthreads = hw ? (hw > 16 ? 16 : hw) : 4;
    if (nrows < 256) nthreads = 1;
    std::vector<std::thread> workers;
    std::vector<int> errs(nthreads, 0);
    const size_t chunk = (nrows + nthreads - 1) / nthreads;
    for (size_t t = 0; t < nthreads; ++t) {
      workers.emplace_back([&, t]() {
        const size_t lo = t * chunk;
        const size_t hi = lo + chunk < nrows ? lo + chunk : nrows;
        for (size_t r = lo; r < hi; ++r) {
          const char* line_end =
              r + 1 < nrows ? idx.rows[r + 1] : idx.end;
          size_t got = parse_row(idx.rows[r], line_end, out + r * ncols, ncols);
          if (got != ncols) {
            // pad short rows with NaN, flag structurally empty ones
            for (size_t c = got; c < ncols; ++c) out[r * ncols + c] = NAN;
            if (got == 0) errs[t] = 1;
          }
        }
      });
    }
    for (auto& w : workers) w.join();
    for (int e : errs) rc |= e;
    Py_END_ALLOW_THREADS
  }
  if (rc) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, "CSV contains unparseable rows");
    return nullptr;
  }

  PyObject* pyheader = PyList_New(ncols);
  for (size_t i = 0; i < ncols; ++i) {
    PyList_SET_ITEM(pyheader, i,
                    PyUnicode_FromStringAndSize(header[i].data(), header[i].size()));
  }
  return Py_BuildValue("(NN)", pyheader, arr);
}

static const uint64_t kMagic = 0x54485a42494e3031ULL;  // "THZBIN01"

static PyObject* thzio_write_cache(PyObject*, PyObject* args) {
  const char* path;
  PyObject* obj;
  if (!PyArg_ParseTuple(args, "sO", &path, &obj)) return nullptr;
  PyArrayObject* arr = reinterpret_cast<PyArrayObject*>(PyArray_FROM_OTF(
      obj, NPY_FLOAT32, NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED));
  if (!arr) return nullptr;
  if (PyArray_NDIM(arr) != 2) {
    Py_DECREF(arr);
    PyErr_SetString(PyExc_ValueError, "expected a 2-D array");
    return nullptr;
  }
  uint64_t rows = PyArray_DIM(arr, 0), cols = PyArray_DIM(arr, 1);
  FILE* f = fopen(path, "wb");
  if (!f) {
    Py_DECREF(arr);
    PyErr_Format(PyExc_IOError, "cannot open %s for write", path);
    return nullptr;
  }
  int ok = 1;
  Py_BEGIN_ALLOW_THREADS
  ok &= fwrite(&kMagic, sizeof(kMagic), 1, f) == 1;
  ok &= fwrite(&rows, sizeof(rows), 1, f) == 1;
  ok &= fwrite(&cols, sizeof(cols), 1, f) == 1;
  size_t n = static_cast<size_t>(rows) * cols;
  ok &= n == 0 || fwrite(PyArray_DATA(arr), sizeof(float), n, f) == n;
  ok &= fclose(f) == 0;  // buffered data may only hit disk here (ENOSPC)
  Py_END_ALLOW_THREADS
  Py_DECREF(arr);
  if (!ok) {
    PyErr_SetString(PyExc_IOError, "short write");
    return nullptr;
  }
  Py_RETURN_NONE;
}

static PyObject* thzio_read_cache(PyObject*, PyObject* args) {
  const char* path;
  if (!PyArg_ParseTuple(args, "s", &path)) return nullptr;
  MappedFile mf;
  if (!map_file(path, &mf)) {
    PyErr_Format(PyExc_IOError, "cannot mmap %s", path);
    return nullptr;
  }
  if (mf.size < 24 || memcmp(mf.data, &kMagic, 8) != 0) {
    PyErr_SetString(PyExc_ValueError, "not a THZBIN01 cache file");
    return nullptr;
  }
  uint64_t rows, cols;
  memcpy(&rows, mf.data + 8, 8);
  memcpy(&cols, mf.data + 16, 8);
  // division form: rows*cols*4 can wrap uint64 for corrupt headers and
  // sail past the check into a giant allocation
  const uint64_t avail = (mf.size - 24) / sizeof(float);
  if (rows != 0 && cols != 0 && avail / rows < cols) {
    PyErr_SetString(PyExc_ValueError, "truncated cache file");
    return nullptr;
  }
  npy_intp dims[2] = {static_cast<npy_intp>(rows), static_cast<npy_intp>(cols)};
  PyObject* arr = PyArray_SimpleNew(2, dims, NPY_FLOAT32);
  if (!arr) return nullptr;
  Py_BEGIN_ALLOW_THREADS
  memcpy(PyArray_DATA(reinterpret_cast<PyArrayObject*>(arr)), mf.data + 24,
         rows * cols * sizeof(float));
  Py_END_ALLOW_THREADS
  return arr;
}

static PyMethodDef ThzioMethods[] = {
    {"parse_csv", thzio_parse_csv, METH_VARARGS,
     "parse_csv(path) -> (header, float32 ndarray)"},
    {"write_cache", thzio_write_cache, METH_VARARGS,
     "write_cache(path, array) -> None"},
    {"read_cache", thzio_read_cache, METH_VARARGS,
     "read_cache(path) -> float32 ndarray"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef thziomodule = {
    PyModuleDef_HEAD_INIT, "thzio",
    "Native IO for pigan_thz_tpu (mmap CSV parser + binary cache)", -1,
    ThzioMethods};

PyMODINIT_FUNC PyInit_thzio(void) {
  import_array();
  return PyModule_Create(&thziomodule);
}
