// Native index builder for stringsearchlib_tpu (narrow/byte strings).
//
// TPU-native equivalent of the reference's C++ build path (StringIndex ctor
// nGramSearch.hpp:120-172, init :54-108, buildGrams :41-46): a single-pass
// normalize + intern + shingle producing the flat arrays the JAX engine
// consumes, instead of the reference's per-instance hash maps.  Exact
// semantic contract is defined by the Python oracle
// (stringsearchlib_tpu/utils/oracle.py); this module must match it and the
// vectorized numpy builder (index/build.py) bit for bit:
//
//   * rows of `row_size` elements; a row is skipped when its master is null
//     or trims empty (nGramSearch.hpp:129-135);
//   * zero weight drops only that element's (term, key) pair (:141-148);
//   * term = escapeBlank -> trim -> toupper of the element; key = plain trim
//     of the row master (:131-139);
//   * string ids: first *recorded* occurrence, element order, term-then-key;
//   * (term, key) edge dedup keeps the LAST weight (map overwrite, :147,165);
//   * long/short split at 2 * gram_size (:82);
//   * postings dedup per (gram, term) - unordered_set semantics
//     (nGramSearch.h:296); gram id = bytes packed into int64, 8-bit fields,
//     first char highest (gramHash, nGramSearch.h:147-150).
//
// Wide (UTF-32) builds stay in the numpy path: their uppercase mapping is
// defined by Python's str.upper and must not drift.

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct StringTable {
  // Arena-interned strings with first-touch ordered ids.
  std::unordered_map<std::string, uint32_t> ids;
  std::vector<std::string> strings;
  std::vector<uint8_t> is_term;
  std::vector<uint8_t> is_key;

  uint32_t intern(const std::string& s, bool as_term) {
    auto it = ids.find(s);
    uint32_t id;
    if (it == ids.end()) {
      id = static_cast<uint32_t>(strings.size());
      ids.emplace(s, id);
      strings.push_back(s);
      is_term.push_back(0);
      is_key.push_back(0);
    } else {
      id = it->second;
    }
    if (as_term)
      is_term[id] = 1;
    else
      is_key[id] = 1;
    return id;
  }
};

inline bool is_space(uint8_t c) {
  return c == ' ' || (c >= 0x09 && c <= 0x0D);
}

// escapeBlank + trim + toupper (nGramSearch.h:30-98 pipeline order as used
// at nGramSearch.hpp:136-139/153-156).
void normalize(const uint8_t* p, Py_ssize_t n, const bool* valid,
               std::string* out) {
  out->clear();
  Py_ssize_t lo = 0, hi = n;
  // after escaping, invalid chars are spaces; trim on the escaped form
  while (lo < hi) {
    uint8_t c = p[lo];
    uint8_t e = valid[c] ? c : ' ';
    if (!is_space(e)) break;
    ++lo;
  }
  while (hi > lo) {
    uint8_t c = p[hi - 1];
    uint8_t e = valid[c] ? c : ' ';
    if (!is_space(e)) break;
    --hi;
  }
  out->reserve(hi - lo);
  for (Py_ssize_t i = lo; i < hi; ++i) {
    uint8_t c = p[i];
    uint8_t e = valid[c] ? c : ' ';
    if (e >= 'a' && e <= 'z') e -= 32;
    out->push_back(static_cast<char>(e));
  }
}

// plain trim (master keys, nGramSearch.hpp:131-133)
void trim_only(const uint8_t* p, Py_ssize_t n, std::string* out) {
  out->clear();
  Py_ssize_t lo = 0, hi = n;
  while (lo < hi && is_space(p[lo])) ++lo;
  while (hi > lo && is_space(p[hi - 1])) --hi;
  out->assign(reinterpret_cast<const char*>(p) + lo, hi - lo);
}

PyArrayObject* make_1d(npy_intp n, int typenum) {
  return reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(1, &n, typenum));
}

PyArrayObject* make_2d(npy_intp r, npy_intp c, int typenum) {
  npy_intp dims[2] = {r, c};
  PyArrayObject* a =
      reinterpret_cast<PyArrayObject*>(PyArray_SimpleNew(2, dims, typenum));
  if (a) std::memset(PyArray_DATA(a), 0, PyArray_NBYTES(a));
  return a;
}

PyObject* build_narrow(PyObject* /*self*/, PyObject* args) {
  PyObject* words_obj;
  long row_size_l;
  PyObject* weights_obj;
  long gram_size_l;
  const char* valid_chars;
  Py_ssize_t valid_n;
  int skip_postings = 0;  // caller rebuilds postings on device / in numpy

  if (!PyArg_ParseTuple(args, "OlOly#|i", &words_obj, &row_size_l,
                        &weights_obj, &gram_size_l, &valid_chars, &valid_n,
                        &skip_postings))
    return nullptr;
  const Py_ssize_t row_size = std::max<long>(row_size_l, 1);
  const int g = static_cast<int>(gram_size_l);

  PyObject* words = PySequence_Fast(words_obj, "words must be a sequence");
  if (!words) return nullptr;
  const Py_ssize_t size = PySequence_Fast_GET_SIZE(words);

  bool valid[256] = {false};
  for (Py_ssize_t i = 0; i < valid_n; ++i)
    valid[static_cast<uint8_t>(valid_chars[i])] = true;

  // weights: optional sequence of floats, padded with 1.0
  std::vector<float> w;
  if (weights_obj != Py_None) {
    PyObject* wf = PySequence_Fast(weights_obj, "weights must be a sequence");
    if (!wf) {
      Py_DECREF(words);
      return nullptr;
    }
    Py_ssize_t wn = PySequence_Fast_GET_SIZE(wf);
    w.resize(size, 1.0f);
    for (Py_ssize_t i = 0; i < std::min(wn, size); ++i) {
      double v = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(wf, i));
      if (v == -1.0 && PyErr_Occurred()) {
        Py_DECREF(wf);
        Py_DECREF(words);
        return nullptr;
      }
      w[i] = static_cast<float>(v);
    }
    Py_DECREF(wf);
  }

  StringTable table;
  table.strings.reserve(size * 2);
  table.ids.reserve(size * 2);
  std::unordered_map<uint64_t, float> edge_w;  // (term_sid<<32|key_sid)
  std::vector<uint64_t> edge_order;            // first-insert order
  edge_w.reserve(size);
  edge_order.reserve(size);

  std::string term_buf, key_buf;
  std::vector<PyObject*> byte_refs;  // latin-1 temporaries to release

  auto elem_bytes = [&](Py_ssize_t i, const uint8_t** p,
                        Py_ssize_t* n) -> int {
    PyObject* o = PySequence_Fast_GET_ITEM(words, i);
    if (o == Py_None) return 0;
    if (PyBytes_Check(o)) {
      *p = reinterpret_cast<const uint8_t*>(PyBytes_AS_STRING(o));
      *n = PyBytes_GET_SIZE(o);
      return 1;
    }
    if (!PyUnicode_Check(o)) {
      // stringify any other type, matching the numpy builder's str(s)
      // (encode_batch) so both paths accept identical inputs
      PyObject* s = PyObject_Str(o);
      if (!s) return -1;
      byte_refs.push_back(s);
      o = s;
    }
    if (PyUnicode_Check(o)) {
      // compact 1-byte unicode IS latin-1: read in place, no allocation
      if (PyUnicode_READY(o) == 0 && PyUnicode_KIND(o) == PyUnicode_1BYTE_KIND) {
        *p = reinterpret_cast<const uint8_t*>(PyUnicode_1BYTE_DATA(o));
        *n = PyUnicode_GET_LENGTH(o);
        return 1;
      }
      PyObject* b = PyUnicode_AsLatin1String(o);
      if (!b) return -1;
      byte_refs.push_back(b);
      *p = reinterpret_cast<const uint8_t*>(PyBytes_AS_STRING(b));
      *n = PyBytes_GET_SIZE(b);
      return 1;
    }
    PyErr_SetString(PyExc_TypeError, "words must be str/bytes/None");
    return -1;
  };

  auto weight_of = [&](Py_ssize_t i) -> float {
    return w.empty() ? 1.0f : w[i];
  };

  bool fail = false;
  for (Py_ssize_t i = 0; i < size && !fail; i += row_size) {
    const uint8_t* mp;
    Py_ssize_t mn;
    int st = elem_bytes(i, &mp, &mn);
    if (st < 0) {
      fail = true;
      break;
    }
    if (st == 0) continue;
    trim_only(mp, mn, &key_buf);
    if (key_buf.empty()) continue;  // row skipped (nGramSearch.hpp:134-135)
    const std::string row_key = key_buf;

    float wi = weight_of(i);
    if (wi != 0.0f) {
      normalize(mp, mn, valid, &term_buf);
      uint32_t t = table.intern(term_buf, true);
      uint32_t k = table.intern(row_key, false);
      uint64_t e = (static_cast<uint64_t>(t) << 32) | k;
      if (edge_w.emplace(e, wi).second)
        edge_order.push_back(e);
      else
        edge_w[e] = wi;
    }
    for (Py_ssize_t j = i + 1; j < std::min(i + row_size, size); ++j) {
      const uint8_t* tp;
      Py_ssize_t tn;
      int st2 = elem_bytes(j, &tp, &tn);
      if (st2 < 0) {
        fail = true;
        break;
      }
      if (st2 == 0) continue;
      float wj = weight_of(j);
      if (wj == 0.0f) continue;
      normalize(tp, tn, valid, &term_buf);
      if (term_buf.empty()) continue;
      uint32_t t = table.intern(term_buf, true);
      uint32_t k = table.intern(row_key, false);
      uint64_t e = (static_cast<uint64_t>(t) << 32) | k;
      if (edge_w.emplace(e, wj).second)
        edge_order.push_back(e);
      else
        edge_w[e] = wj;
    }
  }
  for (PyObject* b : byte_refs) Py_DECREF(b);
  Py_DECREF(words);
  if (fail) return nullptr;

  const size_t u = table.strings.size();
  const size_t cutoff = 2 * static_cast<size_t>(g);

  // term/key local id assignment in string-id (first-touch) order
  std::vector<int32_t> term_local(u, -1), key_local(u, -1);
  std::vector<uint32_t> short_ids, long_ids, key_ids;
  size_t max_term_len = 0, n_terms = 0;
  for (size_t s = 0; s < u; ++s) {
    if (table.is_term[s]) {
      ++n_terms;
      size_t len = table.strings[s].size();
      max_term_len = std::max(max_term_len, len);
      if (len < cutoff)
        short_ids.push_back(static_cast<uint32_t>(s));
      else
        long_ids.push_back(static_cast<uint32_t>(s));
    }
    if (table.is_key[s]) key_ids.push_back(static_cast<uint32_t>(s));
  }
  // long tier ordered by (length, first occurrence): the engine's
  // width-bucketed DP needs a length-ascending tier, and sorting here
  // makes the Python-side remap (_long_length_sort_native) an identity
  // no-op instead of an O(P log P) postings fix-up
  std::stable_sort(long_ids.begin(), long_ids.end(),
                   [&](uint32_t a, uint32_t b) {
                     return table.strings[a].size() <
                            table.strings[b].size();
                   });
  int32_t next = 0;
  for (uint32_t s : short_ids) term_local[s] = next++;
  for (uint32_t s : long_ids) term_local[s] = next++;
  next = 0;
  for (uint32_t s : key_ids) key_local[s] = next++;

  // postings: per-term deduped grams -> counting-sorted CSR.  Skipped on
  // request: at scale the caller shingles the gram CSR ON DEVICE from the
  // resident token matrix (index.device_build) or with the vectorized
  // numpy pass, and this block (shingle + sort of tens of millions of
  // pairs) would be thrown away.
  std::vector<std::pair<int64_t, int32_t>> pairs;
  if (!skip_postings) {
    size_t est = 0;
    for (uint32_t s : long_ids) est += table.strings[s].size();
    pairs.reserve(est);
  }
  std::vector<int64_t> local_grams;
  for (size_t li = 0; !skip_postings && li < long_ids.size(); ++li) {
    const std::string& s = table.strings[long_ids[li]];
    local_grams.clear();
    for (size_t i = 0; i + g <= s.size(); ++i) {
      int64_t h = 0;
      for (int k = 0; k < g; ++k)
        h = (h << 8) | static_cast<uint8_t>(s[i + k]);
      local_grams.push_back(h);
    }
    std::sort(local_grams.begin(), local_grams.end());
    local_grams.erase(std::unique(local_grams.begin(), local_grams.end()),
                      local_grams.end());
    for (int64_t h : local_grams)
      pairs.emplace_back(h, static_cast<int32_t>(li));
  }
  std::sort(pairs.begin(), pairs.end());

  // matrix widths
  auto tier_width = [&](const std::vector<uint32_t>& ids) {
    size_t m = 1;
    for (uint32_t s : ids) m = std::max(m, table.strings[s].size());
    return m;
  };
  const size_t short_w = tier_width(short_ids);
  const size_t long_w = std::max(tier_width(long_ids), (size_t)g);
  const size_t key_w = tier_width(key_ids);

  // ---- numpy outputs ----
  npy_intp n_short = static_cast<npy_intp>(short_ids.size());
  npy_intp n_long = static_cast<npy_intp>(long_ids.size());
  npy_intp n_keys = static_cast<npy_intp>(key_ids.size());
  npy_intp n_edges = static_cast<npy_intp>(edge_order.size());
  npy_intp n_pairs = static_cast<npy_intp>(pairs.size());

  PyArrayObject* short_tokens = make_2d(n_short, short_w, NPY_UINT8);
  PyArrayObject* short_lengths = make_1d(n_short, NPY_INT32);
  PyArrayObject* long_tokens = make_2d(n_long, long_w, NPY_UINT8);
  PyArrayObject* long_lengths = make_1d(n_long, NPY_INT32);
  PyArrayObject* key_tokens = make_2d(n_keys, key_w, NPY_UINT8);
  PyArrayObject* key_lengths = make_1d(n_keys, NPY_INT32);
  PyArrayObject* edge_term = make_1d(n_edges, NPY_INT32);
  PyArrayObject* edge_key = make_1d(n_edges, NPY_INT32);
  PyArrayObject* edge_weight = make_1d(n_edges, NPY_FLOAT32);
  PyArrayObject* gram_terms = make_1d(n_pairs, NPY_INT32);

  if (!short_tokens || !short_lengths || !long_tokens || !long_lengths ||
      !key_tokens || !key_lengths || !edge_term || !edge_key ||
      !edge_weight || !gram_terms)
    return PyErr_NoMemory();

  auto fill_tier = [&](const std::vector<uint32_t>& ids, PyArrayObject* toks,
                       PyArrayObject* lens, size_t width) {
    uint8_t* tp = static_cast<uint8_t*>(PyArray_DATA(toks));
    int32_t* lp = static_cast<int32_t*>(PyArray_DATA(lens));
    for (size_t r = 0; r < ids.size(); ++r) {
      const std::string& s = table.strings[ids[r]];
      std::memcpy(tp + r * width, s.data(), s.size());
      lp[r] = static_cast<int32_t>(s.size());
    }
  };
  fill_tier(short_ids, short_tokens, short_lengths, short_w);
  fill_tier(long_ids, long_tokens, long_lengths, long_w);
  fill_tier(key_ids, key_tokens, key_lengths, key_w);

  {
    int32_t* et = static_cast<int32_t*>(PyArray_DATA(edge_term));
    int32_t* ek = static_cast<int32_t*>(PyArray_DATA(edge_key));
    float* ew = static_cast<float*>(PyArray_DATA(edge_weight));
    for (npy_intp e = 0; e < n_edges; ++e) {
      uint64_t key = edge_order[e];
      et[e] = term_local[static_cast<uint32_t>(key >> 32)];
      ek[e] = key_local[static_cast<uint32_t>(key & 0xFFFFFFFFu)];
      ew[e] = edge_w[key];
    }
  }

  // distinct grams + CSR ptr
  std::vector<int64_t> distinct;
  std::vector<int32_t> counts;
  {
    int32_t* gt = static_cast<int32_t*>(PyArray_DATA(gram_terms));
    int64_t prev = 0;
    bool first = true;
    for (npy_intp p = 0; p < n_pairs; ++p) {
      gt[p] = pairs[p].second;
      if (first || pairs[p].first != prev) {
        distinct.push_back(pairs[p].first);
        counts.push_back(0);
        prev = pairs[p].first;
        first = false;
      }
      counts.back()++;
    }
  }
  npy_intp n_grams = static_cast<npy_intp>(distinct.size());
  PyArrayObject* gram_ids = make_1d(n_grams, NPY_INT64);
  PyArrayObject* gram_ptr = make_1d(n_grams + 1, NPY_INT32);
  if (!gram_ids || !gram_ptr) return PyErr_NoMemory();
  {
    int64_t* gi = static_cast<int64_t*>(PyArray_DATA(gram_ids));
    int32_t* gp = static_cast<int32_t*>(PyArray_DATA(gram_ptr));
    gp[0] = 0;
    for (npy_intp i = 0; i < n_grams; ++i) {
      gi[i] = distinct[i];
      gp[i + 1] = gp[i] + counts[i];
    }
  }

  PyObject* out = PyDict_New();
  if (!out) return nullptr;
  auto put = [&](const char* name, PyArrayObject* a) {
    PyDict_SetItemString(out, name, reinterpret_cast<PyObject*>(a));
    Py_DECREF(a);
  };
  put("short_tokens", short_tokens);
  put("short_lengths", short_lengths);
  put("long_tokens", long_tokens);
  put("long_lengths", long_lengths);
  put("key_tokens", key_tokens);
  put("key_lengths", key_lengths);
  put("edge_term", edge_term);
  put("edge_key", edge_key);
  put("edge_weight", edge_weight);
  put("gram_ids", gram_ids);
  put("gram_ptr", gram_ptr);
  put("gram_terms", gram_terms);
  PyObject* nt = PyLong_FromSize_t(n_terms);
  PyObject* ml = PyLong_FromSize_t(max_term_len);
  PyDict_SetItemString(out, "n_terms", nt);
  PyDict_SetItemString(out, "max_term_len", ml);
  Py_DECREF(nt);
  Py_DECREF(ml);
  return out;
}

PyMethodDef methods[] = {
    {"build_narrow", build_narrow, METH_VARARGS,
     "Build narrow-string index arrays (words, row_size, weights|None, "
     "gram_size, valid_chars) -> dict of numpy arrays"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "_native",
                      "native index builder", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit__native(void) {
  import_array();
  return PyModule_Create(&module);
}
