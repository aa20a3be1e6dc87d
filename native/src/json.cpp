// Native newline-delimited JSON reader.
//
// Reference: cpp/src/arrow/json/ — parallel block parse
// (json/reader.cc), per-key column assembly (json/converter.cc). This
// is an original implementation for the flat-object common case:
//
//   each line holds one JSON object; lines parse in parallel into
//   (key -> token) maps; the union of keys defines the columns (order
//   of first appearance); per-column inference follows the CSV rules
//   (null -> int64 -> bool -> float64 -> string). Missing keys and
//   JSON nulls are nulls. Nested objects/arrays assemble recursively
//   at any depth (assemble_nested -> column tree via parent links);
//   only mixed scalar/nested columns fall back.
//
// String values are unescaped per JSON (\\uXXXX to UTF-8, control
// escapes) and dictionary-encoded into the shared Result layout
// (table_result.h), consumed by arrow1_tpu/io/json.py via the
// a1t_tbl_* accessors.

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "table_result.h"

using a1t::Column;
using a1t::Result;
using a1t::T_BOOL;
using a1t::T_FLOAT64;
using a1t::T_INT64;
using a1t::T_NULL;
using a1t::T_STRING;

namespace {

enum TokKind : uint8_t {
  V_NULL = 0,
  V_TRUE,
  V_FALSE,
  V_NUM,
  V_STR,   // raw (no escapes)
  V_ESTR,  // escaped, needs unescape
  V_MISSING,
  V_ARR,   // raw [...] span (one-level list, assembled post-parse)
  V_OBJ,   // raw {...} span (one-level struct, flattened post-parse)
};

struct Tok {
  const char* p = nullptr;
  int32_t n = 0;
  uint8_t kind = V_MISSING;
};

const char* skip_ws(const char* p, const char* end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
  return p;
}

// Scan a JSON string token starting at the opening quote; returns the
// position after the closing quote, or nullptr. Sets *esc.
const char* scan_string(const char* p, const char* end, bool* esc) {
  p++;  // opening quote
  *esc = false;
  while (p < end) {
    if (*p == '\\') {
      *esc = true;
      p += 2;
      continue;
    }
    if (*p == '"') return p + 1;
    p++;
  }
  return nullptr;
}

void utf8_append(std::string& s, uint32_t cp) {
  if (cp < 0x80) {
    s.push_back((char)cp);
  } else if (cp < 0x800) {
    s.push_back((char)(0xC0 | (cp >> 6)));
    s.push_back((char)(0x80 | (cp & 0x3F)));
  } else if (cp < 0x10000) {
    s.push_back((char)(0xE0 | (cp >> 12)));
    s.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    s.push_back((char)(0x80 | (cp & 0x3F)));
  } else {
    s.push_back((char)(0xF0 | (cp >> 18)));
    s.push_back((char)(0x80 | ((cp >> 12) & 0x3F)));
    s.push_back((char)(0x80 | ((cp >> 6) & 0x3F)));
    s.push_back((char)(0x80 | (cp & 0x3F)));
  }
}

int hex4(const char* p) {
  int v = 0;
  for (int i = 0; i < 4; i++) {
    char c = p[i];
    v <<= 4;
    if (c >= '0' && c <= '9') v |= c - '0';
    else if (c >= 'a' && c <= 'f') v |= c - 'a' + 10;
    else if (c >= 'A' && c <= 'F') v |= c - 'A' + 10;
    else return -1;
  }
  return v;
}

std::string json_unescape(const char* p, int32_t n) {
  std::string s;
  s.reserve(n);
  for (int32_t i = 0; i < n; i++) {
    if (p[i] != '\\') {
      s.push_back(p[i]);
      continue;
    }
    if (++i >= n) break;
    switch (p[i]) {
      case 'n': s.push_back('\n'); break;
      case 't': s.push_back('\t'); break;
      case 'r': s.push_back('\r'); break;
      case 'b': s.push_back('\b'); break;
      case 'f': s.push_back('\f'); break;
      case '/': s.push_back('/'); break;
      case '"': s.push_back('"'); break;
      case '\\': s.push_back('\\'); break;
      case 'u': {
        if (i + 4 < n) {
          int v = hex4(p + i + 1);
          i += 4;
          if (v >= 0xD800 && v < 0xDC00 && i + 6 < n &&
              p[i + 1] == '\\' && p[i + 2] == 'u') {
            int lo = hex4(p + i + 3);
            if (lo >= 0xDC00 && lo < 0xE000) {
              utf8_append(s, 0x10000 + (((uint32_t)v - 0xD800) << 10) +
                                 (lo - 0xDC00));
              i += 6;
              break;
            }
          }
          if (v >= 0) utf8_append(s, (uint32_t)v);
        }
        break;
      }
      default: s.push_back(p[i]);
    }
  }
  return s;
}

// Balanced {..}/[..] span scan (string-aware); nullptr on malformed.
const char* scan_nested(const char* p, const char* end) {
  int depth = 0;
  while (p < end) {
    char c = *p;
    if (c == '"') {
      bool esc;
      p = scan_string(p, end, &esc);
      if (!p) return nullptr;
      continue;
    }
    if (c == '{' || c == '[') depth++;
    if (c == '}' || c == ']') {
      depth--;
      if (depth == 0) return p + 1;
    }
    p++;
  }
  return nullptr;
}

// Parse one object line into (key, token) pairs (nested values become
// V_ARR/V_OBJ spans); false on invalid content.
bool parse_object(const char* lo, const char* hi,
                  std::vector<std::pair<std::string, Tok>>* out) {
  const char* p = skip_ws(lo, hi);
  if (p >= hi || *p != '{') return false;
  p = skip_ws(p + 1, hi);
  if (p < hi && *p == '}') return true;  // empty object
  for (;;) {
    p = skip_ws(p, hi);
    if (p >= hi || *p != '"') return false;
    bool esc = false;
    const char* kend = scan_string(p, hi, &esc);
    if (!kend) return false;
    std::string key = esc ? json_unescape(p + 1, (int32_t)(kend - p - 2))
                          : std::string(p + 1, kend - p - 2);
    p = skip_ws(kend, hi);
    if (p >= hi || *p != ':') return false;
    p = skip_ws(p + 1, hi);
    Tok t;
    if (p < hi && *p == '"') {
      bool vesc = false;
      const char* vend = scan_string(p, hi, &vesc);
      if (!vend) return false;
      t.p = p + 1;
      t.n = (int32_t)(vend - p - 2);
      t.kind = vesc ? V_ESTR : V_STR;
      p = vend;
    } else if (p + 4 <= hi && std::memcmp(p, "null", 4) == 0) {
      t.kind = V_NULL;
      p += 4;
    } else if (p + 4 <= hi && std::memcmp(p, "true", 4) == 0) {
      t.kind = V_TRUE;
      p += 4;
    } else if (p + 5 <= hi && std::memcmp(p, "false", 5) == 0) {
      t.kind = V_FALSE;
      p += 5;
    } else if (p < hi && (*p == '{' || *p == '[')) {
      // capture the balanced nested span; assembled after the parse
      const char* nend = scan_nested(p, hi);
      if (!nend) return false;
      t.p = p;
      t.n = (int32_t)(nend - p);
      t.kind = *p == '[' ? V_ARR : V_OBJ;
      p = nend;
    } else {
      const char* q = p;
      while (q < hi && *q != ',' && *q != '}' && *q != ' ' &&
             *q != '\t' && *q != '\r')
        q++;
      if (q == p) return false;
      t.p = p;
      t.n = (int32_t)(q - p);
      t.kind = V_NUM;
      p = q;
    }
    out->emplace_back(std::move(key), t);
    p = skip_ws(p, hi);
    if (p < hi && *p == ',') {
      p++;
      continue;
    }
    if (p < hi && *p == '}') return true;
    return false;
  }
}

bool tok_i64(const Tok& t, int64_t* out) {
  if (t.kind != V_NUM || t.n == 0 || t.n > 20) return false;
  const char* p = t.p;
  int i = 0;
  bool neg = false;
  int64_t v = 0;  // accumulate NEGATIVE so INT64_MIN parses
  if (p[0] == '-' || p[0] == '+') {
    neg = p[0] == '-';
    i = 1;
  }
  if (i == t.n) return false;
  for (; i < t.n; i++) {
    if (p[i] < '0' || p[i] > '9') return false;
    int64_t d = p[i] - '0';
    if (v < (INT64_MIN + d) / 10) return false;
    v = v * 10 - d;
  }
  if (!neg && v == INT64_MIN) return false;
  *out = neg ? v : -v;
  return true;
}

bool tok_f64(const Tok& t, double* out) {
  if (t.kind != V_NUM || t.n == 0 || t.n > 63) return false;
  char buf[64];
  std::memcpy(buf, t.p, t.n);
  buf[t.n] = 0;
  char* end = nullptr;
  double v = std::strtod(buf, &end);
  if (end != buf + t.n) return false;
  *out = v;
  return true;
}

// Parse "[ v, v, ... ]" with scalar-only elements; false on nested.
bool parse_array_scalars(const char* lo, const char* hi,
                         std::vector<Tok>* out) {
  const char* p = skip_ws(lo, hi);
  if (p >= hi || *p != '[') return false;
  p = skip_ws(p + 1, hi);
  if (p < hi && *p == ']') return true;
  for (;;) {
    p = skip_ws(p, hi);
    Tok t;
    if (p < hi && *p == '"') {
      bool vesc = false;
      const char* vend = scan_string(p, hi, &vesc);
      if (!vend) return false;
      t.p = p + 1;
      t.n = (int32_t)(vend - p - 2);
      t.kind = vesc ? V_ESTR : V_STR;
      p = vend;
    } else if (p + 4 <= hi && std::memcmp(p, "null", 4) == 0) {
      t.kind = V_NULL;
      p += 4;
    } else if (p + 4 <= hi && std::memcmp(p, "true", 4) == 0) {
      t.kind = V_TRUE;
      p += 4;
    } else if (p + 5 <= hi && std::memcmp(p, "false", 5) == 0) {
      t.kind = V_FALSE;
      p += 5;
    } else if (p < hi && (*p == '{' || *p == '[')) {
      return false;  // deeper nesting: fallback
    } else {
      const char* q = p;
      while (q < hi && *q != ',' && *q != ']' && *q != ' ' &&
             *q != '\t' && *q != '\r')
        q++;
      if (q == p) return false;
      t.p = p;
      t.n = (int32_t)(q - p);
      t.kind = V_NUM;
      p = q;
    }
    out->push_back(t);
    p = skip_ws(p, hi);
    if (p < hi && *p == ',') {
      p++;
      continue;
    }
    if (p < hi && *p == ']') return true;
    return false;
  }
}

// Parse "[ v, v, ... ]" capturing nested values as V_ARR/V_OBJ spans
// (arbitrary depth: the recursive assembler re-parses the spans).
bool parse_array_toks(const char* lo, const char* hi,
                      std::vector<Tok>* out) {
  const char* p = skip_ws(lo, hi);
  if (p >= hi || *p != '[') return false;
  p = skip_ws(p + 1, hi);
  if (p < hi && *p == ']') return true;
  for (;;) {
    p = skip_ws(p, hi);
    Tok t;
    if (p < hi && *p == '"') {
      bool vesc = false;
      const char* vend = scan_string(p, hi, &vesc);
      if (!vend) return false;
      t.p = p + 1;
      t.n = (int32_t)(vend - p - 2);
      t.kind = vesc ? V_ESTR : V_STR;
      p = vend;
    } else if (p + 4 <= hi && std::memcmp(p, "null", 4) == 0) {
      t.kind = V_NULL;
      p += 4;
    } else if (p + 4 <= hi && std::memcmp(p, "true", 4) == 0) {
      t.kind = V_TRUE;
      p += 4;
    } else if (p + 5 <= hi && std::memcmp(p, "false", 5) == 0) {
      t.kind = V_FALSE;
      p += 5;
    } else if (p < hi && (*p == '{' || *p == '[')) {
      const char* nend = scan_nested(p, hi);
      if (!nend) return false;
      t.p = p;
      t.n = (int32_t)(nend - p);
      t.kind = *p == '[' ? V_ARR : V_OBJ;
      p = nend;
    } else {
      const char* q = p;
      while (q < hi && *q != ',' && *q != ']' && *q != ' ' &&
             *q != '\t' && *q != '\r')
        q++;
      if (q == p) return false;
      t.p = p;
      t.n = (int32_t)(q - p);
      t.kind = V_NUM;
      p = q;
    }
    out->push_back(t);
    p = skip_ws(p, hi);
    if (p < hi && *p == ',') {
      p++;
      continue;
    }
    if (p < hi && *p == ']') return true;
    return false;
  }
}

// Infer + materialize a scalar token sequence into `col`'s typed
// vectors; validity lands in *valid_out (may be col.valid).
void materialize_scalars(Column& col, const std::vector<Tok>& toks,
                         std::vector<uint8_t>* valid_out) {
  // single speculative pass (same fusion as csv.cpp): values land in
  // typed vectors while inference flags stay alive; f64 reuses the i64
  // parse for int-shaped tokens; only the string fallback re-walks.
  int64_t n = (int64_t)toks.size();
  bool can_i = true, can_b = true, can_f = true, all_null = true;
  valid_out->assign(n, 1);
  std::vector<int64_t> i64v(n);
  std::vector<double> f64v(n);
  std::vector<uint8_t> b8v(n);
  for (int64_t r = 0; r < n; r++) {
    const Tok& t = toks[r];
    if (t.kind == V_NULL || t.kind == V_MISSING) {
      (*valid_out)[r] = 0;
      continue;
    }
    all_null = false;
    if (!can_i && !can_b && !can_f) continue;
    if (t.kind == V_TRUE || t.kind == V_FALSE) {
      can_i = can_f = false;
      b8v[r] = t.kind == V_TRUE;
    } else if (t.kind == V_STR || t.kind == V_ESTR) {
      can_i = can_b = can_f = false;
    } else {
      can_b = false;
      bool i_ok = false;
      if (can_i || can_f) {
        i_ok = tok_i64(t, &i64v[r]);
        if (can_i && !i_ok) can_i = false;
      }
      if (can_f) {
        if (i_ok) f64v[r] = (double)i64v[r];
        else if (!tok_f64(t, &f64v[r])) can_f = false;
      }
    }
  }
  int32_t ty = all_null ? T_NULL
               : can_i  ? T_INT64
               : can_b  ? T_BOOL
               : can_f  ? T_FLOAT64
                        : T_STRING;
  col.type = ty;
  if (ty == T_INT64) col.i64 = std::move(i64v);
  if (ty == T_FLOAT64) col.f64 = std::move(f64v);
  if (ty == T_BOOL) col.b8 = std::move(b8v);
  if (ty != T_STRING) return;
  valid_out->assign(n, 1);
  std::unordered_map<std::string, int32_t> memo;
  col.codes.resize(n);
  col.offsets.push_back(0);
  for (int64_t r = 0; r < n; r++) {
    const Tok& t = toks[r];
    if (t.kind == V_NULL || t.kind == V_MISSING) {
      (*valid_out)[r] = 0;
      continue;
    }
    std::string v;
    if (t.kind == V_ESTR) {
      v = json_unescape(t.p, t.n);
    } else if (t.kind == V_STR) {
      v.assign(t.p, t.n);
    } else if (t.kind == V_TRUE) {
      v = "true";
    } else if (t.kind == V_FALSE) {
      v = "false";
    } else {
      v.assign(t.p, t.n);
    }
    auto it = memo.find(v);
    int32_t code;
    if (it == memo.end()) {
      code = (int32_t)memo.size();
      col.bytes.insert(col.bytes.end(), v.begin(), v.end());
      col.offsets.push_back((int32_t)col.bytes.size());
      memo.emplace(std::move(v), code);
    } else {
      code = it->second;
    }
    col.codes[r] = code;
  }
}

// Recursive assembly: token stream (one slot per logical row at this
// level) -> column `ci` plus appended descendant columns. Arbitrary
// depth: lists recurse through a single ".$" element child; objects
// fan out "name.key" children at this level's granularity (V_MISSING
// where the parent slot is absent). Mirrors the reference's
// json/converter.cc per-kind converters, tree-shaped.
bool assemble_nested(Result* res, size_t ci, const std::vector<Tok>& toks) {
  bool arr = false, obj = false, scal = false;
  for (const auto& t : toks) {
    if (t.kind == V_ARR) arr = true;
    else if (t.kind == V_OBJ) obj = true;
    else if (t.kind != V_NULL && t.kind != V_MISSING) scal = true;
  }
  if ((arr && (obj || scal)) || (obj && scal)) {
    res->error = "json: mixed nested/scalar column (fallback path)";
    return false;
  }
  int64_t n = (int64_t)toks.size();
  if (arr) {
    std::vector<Tok> elems;
    {
      Column& col = res->cols[ci];
      col.type = a1t::T_LIST;
      col.valid.assign(n, 1);
      col.list_offsets.clear();
      col.list_offsets.reserve(n + 1);
      col.list_offsets.push_back(0);
    }
    for (int64_t r = 0; r < n; r++) {
      const Tok& t = toks[r];
      if (t.kind == V_ARR) {
        if (!parse_array_toks(t.p, t.p + t.n, &elems)) {
          res->error = "json: malformed array (fallback path)";
          return false;
        }
      } else {
        res->cols[ci].valid[r] = 0;
      }
      res->cols[ci].list_offsets.push_back((int64_t)elems.size());
    }
    std::string name = res->cols[ci].name;
    size_t child = res->cols.size();
    res->cols.emplace_back();
    res->cols[child].name = name + ".$";
    res->cols[child].parent = name;
    return assemble_nested(res, child, elems);
  }
  if (obj) {
    {
      Column& col = res->cols[ci];
      col.type = T_NULL;
      col.valid.assign(n, 0);
    }
    std::unordered_map<std::string, size_t> childidx;
    std::vector<std::string> keys;
    std::vector<std::vector<Tok>> ctoks;
    for (int64_t r = 0; r < n; r++) {
      const Tok& t = toks[r];
      if (t.kind != V_OBJ) continue;
      res->cols[ci].valid[r] = 1;
      std::vector<std::pair<std::string, Tok>> kv;
      if (!parse_object(t.p, t.p + t.n, &kv)) {
        res->error = "json: malformed child object (fallback path)";
        return false;
      }
      for (auto& e : kv) {
        auto ins = childidx.emplace(e.first, keys.size());
        if (ins.second) {
          keys.push_back(e.first);
          ctoks.emplace_back((size_t)n, Tok());  // V_MISSING default
        }
        ctoks[ins.first->second][r] = e.second;
      }
    }
    std::string name = res->cols[ci].name;
    for (size_t k = 0; k < keys.size(); k++) {
      size_t child = res->cols.size();
      res->cols.emplace_back();
      res->cols[child].name = name + "." + keys[k];
      res->cols[child].parent = name;
      if (!assemble_nested(res, child, ctoks[k])) return false;
    }
    return true;
  }
  Column& col = res->cols[ci];
  materialize_scalars(col, toks, &col.valid);
  return true;
}

}  // namespace

extern "C" {

void* a1t_json_parse(const char* buf, int64_t len, int nthreads) {
  auto* res = new Result();
  if (nthreads <= 0)
    nthreads = std::max(1u, std::thread::hardware_concurrency());
  // line boundaries (JSON strings escape newlines, so raw \n splits)
  std::vector<std::pair<const char*, const char*>> lines;
  {
    const char* p = buf;
    const char* end = buf + len;
    while (p < end) {
      const char* nl = (const char*)memchr(p, '\n', end - p);
      const char* hi = nl ? nl : end;
      const char* q = skip_ws(p, hi);
      if (q < hi) lines.emplace_back(p, hi);
      if (!nl) break;
      p = nl + 1;
    }
  }
  int64_t nrows = (int64_t)lines.size();
  res->nrows = nrows;

  // parallel object parse
  std::vector<std::vector<std::pair<std::string, Tok>>> rows(nrows);
  std::atomic<bool> bad{false};
  {
    std::vector<std::thread> ts;
    int64_t chunk = (nrows + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
      ts.emplace_back([&, t] {
        int64_t lo = t * chunk, hi = std::min(nrows, lo + chunk);
        for (int64_t r = lo; r < hi; r++) {
          if (!parse_object(lines[r].first, lines[r].second, &rows[r])) {
            bad.store(true);
            return;
          }
        }
      });
    }
    for (auto& th : ts) th.join();
  }
  if (bad.load()) {
    res->error = "json: nested or malformed object (fallback path)";
    return res;
  }

  // column order = first appearance across rows
  std::unordered_map<std::string, int32_t> colidx;
  for (int64_t r = 0; r < nrows; r++) {
    for (auto& kv : rows[r]) {
      if (colidx.emplace(kv.first, (int32_t)colidx.size()).second) {
        res->cols.emplace_back();
        res->cols.back().name = kv.first;
      }
    }
  }
  size_t ncols = res->cols.size();

  // per-row token grid
  std::vector<Tok> grid((size_t)nrows * ncols);
  for (int64_t r = 0; r < nrows; r++) {
    for (auto& kv : rows[r]) {
      grid[(size_t)r * ncols + colidx[kv.first]] = kv.second;
    }
  }

  // classify columns: scalar columns materialize in parallel (the
  // flat common case); nested columns (arrays/objects at ANY depth)
  // assemble recursively via assemble_nested. Mixed shapes error ->
  // pyarrow fallback.
  enum CKind { C_SCALAR, C_NESTED };
  std::vector<CKind> ckind(ncols, C_SCALAR);
  for (size_t c = 0; c < ncols; c++) {
    bool arr = false, obj = false, scal = false;
    for (int64_t r = 0; r < nrows; r++) {
      uint8_t k = grid[(size_t)r * ncols + c].kind;
      if (k == V_ARR) arr = true;
      else if (k == V_OBJ) obj = true;
      else if (k != V_NULL && k != V_MISSING) scal = true;
    }
    if ((arr && (obj || scal)) || (obj && scal)) {
      res->error = "json: mixed nested/scalar column (fallback path)";
      return res;
    }
    ckind[c] = (arr || obj) ? C_NESTED : C_SCALAR;
  }

  // parallel scalar materialization
  {
    std::vector<size_t> scalars;
    for (size_t c = 0; c < ncols; c++)
      if (ckind[c] == C_SCALAR) scalars.push_back(c);
    std::vector<std::thread> ts;
    std::atomic<size_t> next{0};
    int nt = (int)std::min<size_t>(nthreads,
                                   scalars.empty() ? 1 : scalars.size());
    for (int t = 0; t < nt; t++) {
      ts.emplace_back([&] {
        for (;;) {
          size_t i = next.fetch_add(1);
          if (i >= scalars.size()) return;
          size_t c = scalars[i];
          std::vector<Tok> toks(nrows);
          for (int64_t r = 0; r < nrows; r++)
            toks[r] = grid[(size_t)r * ncols + c];
          Column& col = res->cols[c];
          materialize_scalars(col, toks, &col.valid);
        }
      });
    }
    for (auto& th : ts) th.join();
  }

  // nested columns: recursive assembly (appends descendant columns)
  for (size_t c = 0; c < ncols; c++) {
    if (ckind[c] != C_NESTED) continue;
    std::vector<Tok> toks(nrows);
    for (int64_t r = 0; r < nrows; r++)
      toks[r] = grid[(size_t)r * ncols + c];
    if (!assemble_nested(res, c, toks)) return res;
  }
  return res;
}

}  // extern "C"
