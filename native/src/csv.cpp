// Native CSV parser: parallel chunker -> parser -> converter.
//
// Reference architecture: cpp/src/arrow/csv/ — BlockParser
// (csv/parser.cc), parallel chunk decode (csv/reader.cc:697-980), type
// inference with promotion (csv/converter.cc, inference order
// null -> int64 -> bool -> float64 -> string). This is an original
// implementation against RFC 4180 semantics:
//
//   phase A  quote-parity prescan (parallel): each thread counts quote
//            chars in its slice; the exclusive parity prefix gives every
//            slice its starting in-quote state (the classic two-pass
//            parallel-CSV trick), then row breaks = newlines outside
//            quotes (parallel).
//   phase B  field split per row range (parallel): (start,len,quoted)
//            triples into the raw buffer; escaped quotes ("") unescape
//            lazily at materialization.
//   phase C  per-column type inference (parallel by column).
//   phase D  buffer materialization (parallel by column).
//
// C ABI only (consumed via ctypes from arrow1_tpu/io/csv.py).

#include <atomic>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

#include "table_result.h"

using a1t::Column;
using a1t::Result;
using a1t::T_BOOL;
using a1t::T_DATE32;
using a1t::T_FLOAT64;
using a1t::T_INT64;
using a1t::T_NULL;
using a1t::T_STRING;
using a1t::T_TS_NS;
using a1t::T_TS_S;

namespace {

struct Field {
  int64_t start;
  int32_t len;
  uint8_t quoted;  // contains escaped quotes -> needs unescape
};

bool is_null_token(const char* p, int32_t n) {
  // the reference's default null spellings (csv/options.h null_values)
  static const char* kNulls[] = {
      "",     "#N/A", "#N/A N/A", "#NA",     "-1.#IND", "-1.#QNAN",
      "-NaN", "-nan", "1.#IND",   "1.#QNAN", "N/A",     "NA",
      "NULL", "NaN",  "n/a",      "nan",     "null"};
  for (const char* s : kNulls) {
    size_t l = std::strlen(s);
    if (l == (size_t)n && std::memcmp(p, s, l) == 0) return true;
  }
  return false;
}

bool parse_i64(const char* p, int32_t n, int64_t* out) {
  if (n == 0 || n > 20) return false;
  int64_t v = 0;  // accumulate NEGATIVE so INT64_MIN parses
  int i = 0;
  bool neg = false;
  if (p[0] == '-' || p[0] == '+') {
    neg = p[0] == '-';
    i = 1;
  }
  if (i == n) return false;
  for (; i < n; i++) {
    if (p[i] < '0' || p[i] > '9') return false;
    int64_t d = p[i] - '0';
    if (v < (INT64_MIN + d) / 10) return false;  // overflow
    v = v * 10 - d;
  }
  if (!neg && v == INT64_MIN) return false;
  *out = neg ? v : -v;
  return true;
}

bool parse_f64(const char* p, int32_t n, double* out) {
  if (n == 0 || n > 63) return false;
  char buf[64];
  std::memcpy(buf, p, n);
  buf[n] = 0;
  char* end = nullptr;
  double v = std::strtod(buf, &end);
  if (end != buf + n) return false;
  *out = v;
  return true;
}

int parse_bool(const char* p, int32_t n) {
  // reference default true/false spellings (csv/options.h)
  static const char* kTrue[] = {"1", "True", "TRUE", "true"};
  static const char* kFalse[] = {"0", "False", "FALSE", "false"};
  for (const char* s : kTrue)
    if (std::strlen(s) == (size_t)n && std::memcmp(p, s, n) == 0) return 1;
  for (const char* s : kFalse)
    if (std::strlen(s) == (size_t)n && std::memcmp(p, s, n) == 0) return 0;
  return -1;
}

inline bool dig2(const char* p, int32_t* out) {
  if (p[0] < '0' || p[0] > '9' || p[1] < '0' || p[1] > '9') return false;
  *out = (p[0] - '0') * 10 + (p[1] - '0');
  return true;
}

// days since 1970-01-01 for a validated civil date
// (the standard days-from-civil formula; branch-free era arithmetic)
inline int64_t civil_days(int64_t y, int64_t m, int64_t d) {
  y -= m <= 2;
  const int64_t era = (y >= 0 ? y : y - 399) / 400;
  const int64_t yoe = y - era * 400;
  const int64_t doy = (153 * (m + (m > 2 ? -3 : 9)) + 2) / 5 + d - 1;
  const int64_t doe = yoe * 365 + yoe / 4 - yoe / 100 + doy;
  return era * 146097 + doe - 719468;
}

// strict ISO8601 calendar date YYYY-MM-DD -> days since epoch
bool parse_date32(const char* p, int32_t n, int64_t* days) {
  if (n != 10 || p[4] != '-' || p[7] != '-') return false;
  int32_t mo, dy;
  for (int i = 0; i < 4; i++)
    if (p[i] < '0' || p[i] > '9') return false;
  if (!dig2(p + 5, &mo) || !dig2(p + 8, &dy)) return false;
  int32_t yr = (p[0] - '0') * 1000 + (p[1] - '0') * 100 +
               (p[2] - '0') * 10 + (p[3] - '0');
  if (mo < 1 || mo > 12 || dy < 1) return false;
  static const int32_t kDim[] = {31, 28, 31, 30, 31, 30,
                                 31, 31, 30, 31, 30, 31};
  int32_t lim = kDim[mo - 1];
  if (mo == 2 && (yr % 4 == 0 && (yr % 100 != 0 || yr % 400 == 0)))
    lim = 29;
  if (dy > lim) return false;
  *days = civil_days(yr, mo, dy);
  return true;
}

// ISO8601 timestamp: date, optionally followed by [T or space]
// hh:mm[:ss[.fraction]] (the reference's ParseTimestampISO8601
// surface, util/value_parsing.h — this snapshot rejects zone
// suffixes, verified against the pyarrow oracle). Returns seconds
// since epoch + fractional nanoseconds; *frac_digits = 0 when no
// fraction was present (unit inference: seconds vs nanoseconds).
bool parse_ts(const char* p, int32_t n, int64_t* secs, int64_t* nanos,
              int* frac_digits) {
  int64_t days;
  *nanos = 0;
  *frac_digits = 0;
  if (n >= 10 && parse_date32(p, 10, &days)) {
    if (n == 10) {
      *secs = days * 86400;
      return true;
    }
  } else {
    return false;
  }
  int32_t i = 10;
  if (p[i] != 'T' && p[i] != ' ') return false;
  i++;
  int32_t hh, mm, ss = 0;
  if (n < i + 5 || !dig2(p + i, &hh) || p[i + 2] != ':' ||
      !dig2(p + i + 3, &mm))
    return false;
  i += 5;
  if (i < n && p[i] == ':') {
    if (n < i + 3 || !dig2(p + i + 1, &ss)) return false;
    i += 3;
    if (i < n && p[i] == '.') {
      i++;
      int64_t f = 0;
      int d = 0;
      while (i < n && p[i] >= '0' && p[i] <= '9' && d < 9) {
        f = f * 10 + (p[i] - '0');
        d++;
        i++;
      }
      if (d == 0) return false;
      while (d < 9) {
        f *= 10;
        d++;
      }
      *nanos = f;
      *frac_digits = 1;
    }
  }
  if (i != n) return false;
  if (hh > 23 || mm > 59 || ss > 59) return false;
  *secs = days * 86400 + hh * 3600 + mm * 60 + ss;
  return true;
}

struct Parsed {
  std::vector<int64_t> row_starts;  // byte offset of each record start
  int64_t nrows = 0;
};

// Phase A: record boundaries with quote awareness, in parallel.
void find_rows(const char* buf, int64_t len, char quote, int nthreads,
               std::vector<int64_t>* row_starts) {
  nthreads = std::max(1, nthreads);
  std::vector<int64_t> qcount(nthreads, 0);
  int64_t chunk = (len + nthreads - 1) / nthreads;
  // pass 1: quote counts per slice
  {
    std::vector<std::thread> ts;
    for (int t = 0; t < nthreads; t++) {
      ts.emplace_back([&, t] {
        int64_t lo = t * chunk, hi = std::min(len, lo + chunk);
        int64_t c = 0;
        for (int64_t i = lo; i < hi; i++) c += buf[i] == quote;
        qcount[t] = c;
      });
    }
    for (auto& th : ts) th.join();
  }
  // pass 2: newline scan with known starting parity
  std::vector<std::vector<int64_t>> local(nthreads);
  {
    std::vector<std::thread> ts;
    int64_t parity = 0;
    std::vector<int64_t> start_parity(nthreads);
    for (int t = 0; t < nthreads; t++) {
      start_parity[t] = parity & 1;
      parity += qcount[t];
    }
    for (int t = 0; t < nthreads; t++) {
      ts.emplace_back([&, t] {
        int64_t lo = t * chunk, hi = std::min(len, lo + chunk);
        bool inq = start_parity[t] != 0;
        auto& out = local[t];
        for (int64_t i = lo; i < hi; i++) {
          char c = buf[i];
          if (c == quote) {
            inq = !inq;
          } else if (c == '\n' && !inq) {
            out.push_back(i + 1);  // next record starts after newline
          }
        }
      });
    }
    for (auto& th : ts) th.join();
  }
  row_starts->clear();
  row_starts->push_back(0);
  for (auto& v : local)
    row_starts->insert(row_starts->end(), v.begin(), v.end());
  if (row_starts->back() != len) row_starts->push_back(len);
}

// Split one record [lo, hi) into fields.
void split_record(const char* buf, int64_t lo, int64_t hi, char delim,
                  char quote, std::vector<Field>* out) {
  // trim the record terminator
  while (hi > lo && (buf[hi - 1] == '\n' || buf[hi - 1] == '\r')) hi--;
  int64_t i = lo;
  for (;;) {
    Field f{i, 0, 0};
    if (i < hi && buf[i] == quote) {
      // quoted field: scan to closing quote, "" = escaped
      int64_t j = i + 1;
      f.start = j;
      bool esc = false;
      while (j < hi) {
        if (buf[j] == quote) {
          if (j + 1 < hi && buf[j + 1] == quote) {
            esc = true;
            j += 2;
            continue;
          }
          break;
        }
        j++;
      }
      f.len = (int32_t)(j - f.start);
      f.quoted = esc ? 2 : 1;
      i = j + 1;  // past closing quote
      while (i < hi && buf[i] != delim) i++;
    } else {
      int64_t j = i;
      while (j < hi && buf[j] != delim) j++;
      f.len = (int32_t)(j - f.start);
      i = j;
    }
    out->push_back(f);
    if (i >= hi) break;
    i++;  // past delimiter
  }
}

std::string unescape(const char* p, int32_t n, char quote) {
  std::string s;
  s.reserve(n);
  for (int32_t i = 0; i < n; i++) {
    s.push_back(p[i]);
    if (p[i] == quote && i + 1 < n && p[i + 1] == quote) i++;
  }
  return s;
}

}  // namespace

extern "C" {

// Parse a CSV buffer. Returns an opaque Result*; NULL never (errors are
// carried in the result). Column count is taken from the first record.
void* a1t_csv_parse(const char* buf, int64_t len, char delimiter,
                    char quote, int has_header, int64_t skip_rows,
                    int nthreads) {
  auto* res = new Result();
  if (nthreads <= 0)
    nthreads = std::max(1u, std::thread::hardware_concurrency());
  std::vector<int64_t> bounds;
  find_rows(buf, len, quote, nthreads, &bounds);
  // record list, skipping empty lines (reference
  // ParseOptions::ignore_empty_lines default)
  std::vector<std::pair<int64_t, int64_t>> recs;
  for (size_t r = 0; r + 1 < bounds.size(); r++) {
    int64_t lo = bounds[r], hi = bounds[r + 1];
    while (hi > lo && (buf[hi - 1] == '\n' || buf[hi - 1] == '\r')) hi--;
    if (hi > lo) recs.emplace_back(bounds[r], bounds[r + 1]);
  }
  int64_t nrec = (int64_t)recs.size();

  int64_t first = std::min(skip_rows, nrec);
  std::vector<Field> header;
  if (first < nrec) {
    split_record(buf, recs[first].first, recs[first].second, delimiter,
                 quote, &header);
  }
  size_t ncols = header.size();
  if (ncols == 0) return res;
  res->cols.resize(ncols);
  if (has_header) {
    for (size_t c = 0; c < ncols; c++) {
      const Field& f = header[c];
      res->cols[c].name =
          f.quoted == 2 ? unescape(buf + f.start, f.len, quote)
                        : std::string(buf + f.start, f.len);
    }
    first++;
  } else {
    for (size_t c = 0; c < ncols; c++)
      res->cols[c].name = "f" + std::to_string(c);
  }

  int64_t ndata = nrec - first;
  if (ndata < 0) ndata = 0;
  res->nrows = ndata;

  // Phase B: fields[row * ncols + col], parallel over row ranges
  std::vector<Field> fields((size_t)ndata * ncols, Field{0, 0, 0});
  {
    std::atomic<bool> bad{false};
    std::vector<std::thread> ts;
    int64_t chunk = (ndata + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; t++) {
      ts.emplace_back([&, t] {
        int64_t lo = t * chunk, hi = std::min(ndata, lo + chunk);
        std::vector<Field> rec;
        for (int64_t r = lo; r < hi; r++) {
          rec.clear();
          split_record(buf, recs[first + r].first, recs[first + r].second,
                       delimiter, quote, &rec);
          if (rec.size() != ncols) {
            bad.store(true);
            return;
          }
          std::memcpy(&fields[(size_t)r * ncols], rec.data(),
                      ncols * sizeof(Field));
        }
      });
    }
    for (auto& th : ts) th.join();
    if (bad.load()) {
      res->error = "CSV parse error: row with wrong number of columns";
      return res;
    }
  }

  // Phases C+D per column, parallel by column
  {
    std::vector<std::thread> ts;
    std::atomic<size_t> next{0};
    for (int t = 0; t < std::min<size_t>(nthreads, ncols); t++) {
      ts.emplace_back([&] {
        for (;;) {
          size_t c = next.fetch_add(1);
          if (c >= ncols) return;
          Column& col = res->cols[c];
          // single speculative pass: null -> int64 -> bool -> date32 ->
          // timestamp[s] -> timestamp[ns] -> float64 -> string (the
          // reference promotion chain, csv/inference_internal.h:34-65).
          // Values materialize WHILE inferring, so numeric columns
          // parse each field once; only the string fallback needs a
          // second pass. f64 reuses the i64 parse when the field was
          // int-shaped (no strtod on integer columns).
          bool can_i64 = true, can_b = true, can_f = true;
          bool can_d = true, can_t = true;
          bool saw_frac = false;
          bool all_null = true;
          col.valid.assign(ndata, 1);
          std::vector<int64_t> i64v(ndata);
          std::vector<double> f64v(ndata);
          std::vector<uint8_t> b8v(ndata);
          std::vector<int64_t> dtv(ndata);  // days OR ts secs/nanos
          for (int64_t r = 0; r < ndata; r++) {
            const Field& f = fields[(size_t)r * ncols + c];
            // reference default quoted_strings_can_be_null=true: null
            // spellings count quoted or not (csv/options.h:91)
            if (f.quoted != 2 && is_null_token(buf + f.start, f.len)) {
              col.valid[r] = 0;
              continue;
            }
            all_null = false;
            if (!can_i64 && !can_b && !can_f && !can_d && !can_t)
              continue;
            const char* p = buf + f.start;
            int32_t n = f.len;
            std::string tmp;
            if (f.quoted == 2) {
              tmp = unescape(p, n, '"');
              p = tmp.data();
              n = (int32_t)tmp.size();
            }
            bool i_ok = false;
            if (can_i64 || can_f) {
              i_ok = parse_i64(p, n, &i64v[r]);
              if (can_i64 && !i_ok) can_i64 = false;
            }
            if (can_b) {
              int bv = parse_bool(p, n);
              if (bv < 0) can_b = false;
              else b8v[r] = (uint8_t)bv;
            }
            if (can_d || can_t) {
              // cheap shape precheck keeps numeric columns free
              if (n >= 10 && p[4] == '-' && p[7] == '-') {
                int64_t days, secs, nanos;
                int fd;
                if (can_d) {
                  if (n == 10 && parse_date32(p, n, &days)) {
                    dtv[r] = days;
                  } else {
                    can_d = false;
                  }
                }
                if (can_t && !can_d) {
                  // date column being promoted: re-derive secs for
                  // already-seen pure dates lazily below
                  if (parse_ts(p, n, &secs, &nanos, &fd)) {
                    if (fd) saw_frac = true;
                    // store seconds; fractional ns recovered in the
                    // ns re-parse pass only when the column lands ns
                    dtv[r] = secs;
                  } else {
                    can_t = false;
                  }
                } else if (can_t && can_d) {
                  // value is a pure date: valid for ts too (midnight)
                }
              } else {
                can_d = false;
                can_t = false;
              }
            }
            if (can_f) {
              if (i_ok) {
                f64v[r] = (double)i64v[r];
              } else if (!parse_f64(p, n, &f64v[r])) {
                can_f = false;
              }
            }
          }
          int32_t ty = all_null  ? T_NULL
                       : can_i64 ? T_INT64
                       : can_b   ? T_BOOL
                       : can_d   ? T_DATE32
                       : can_t   ? (saw_frac ? T_TS_NS : T_TS_S)
                       : can_f   ? T_FLOAT64
                                 : T_STRING;
          if (ty == T_TS_S || ty == T_TS_NS) {
            // one uniform re-parse: the speculative pass stored a mix
            // of day counts and seconds depending on when the column
            // was promoted; timestamps are rare enough that a second
            // typed pass is simpler than tracking per-row provenance
            bool ok = true;
            for (int64_t r = 0; r < ndata && ok; r++) {
              if (!col.valid[r]) continue;
              const Field& f = fields[(size_t)r * ncols + c];
              const char* p = buf + f.start;
              int32_t n = f.len;
              std::string tmp;
              if (f.quoted == 2) {
                tmp = unescape(p, n, '"');
                p = tmp.data();
                n = (int32_t)tmp.size();
              }
              int64_t secs, nanos;
              int fd;
              ok = parse_ts(p, n, &secs, &nanos, &fd);
              if (!ok) break;
              if (ty == T_TS_NS) {
                // overflow guard: |secs| beyond ~292 years cannot be
                // represented in ns; fall through to float64/string
                if (secs > 9223372035LL || secs < -9223372036LL) {
                  ok = false;
                  break;
                }
                dtv[r] = secs * 1000000000LL + nanos;
              } else {
                dtv[r] = secs;
              }
            }
            if (!ok) ty = can_f ? T_FLOAT64 : T_STRING;
          }
          col.type = ty;
          if (ty == T_INT64) col.i64 = std::move(i64v);
          if (ty == T_FLOAT64) col.f64 = std::move(f64v);
          if (ty == T_BOOL) col.b8 = std::move(b8v);
          if (ty == T_DATE32 || ty == T_TS_S || ty == T_TS_NS)
            col.i64 = std::move(dtv);
          if (ty != T_STRING) continue;
          // string fallback: every token (null-spelled or not) is a
          // literal value (reference default strings_can_be_null=false,
          // csv/options.h:87); dictionary-encode on the fly
          col.valid.assign(ndata, 1);
          col.codes.resize(ndata);
          col.offsets.push_back(0);
          std::unordered_map<std::string, int32_t> memo;
          for (int64_t r = 0; r < ndata; r++) {
            const Field& f = fields[(size_t)r * ncols + c];
            const char* p = buf + f.start;
            int32_t n = f.len;
            std::string tmp;
            if (f.quoted == 2) {
              tmp = unescape(p, n, '"');
              p = tmp.data();
              n = (int32_t)tmp.size();
            }
            std::string key(p, (size_t)n);
            auto it = memo.find(key);
            int32_t code;
            if (it == memo.end()) {
              code = (int32_t)memo.size();
              memo.emplace(std::move(key), code);
              col.bytes.insert(col.bytes.end(), p, p + n);
              col.offsets.push_back((int32_t)col.bytes.size());
            } else {
              code = it->second;
            }
            col.codes[r] = code;
          }
        }
      });
    }
    for (auto& th : ts) th.join();
  }
  return res;
}

const char* a1t_tbl_error(void* h) {
  auto* r = (Result*)h;
  return r->error.empty() ? nullptr : r->error.c_str();
}

int64_t a1t_tbl_nrows(void* h) { return ((Result*)h)->nrows; }
int32_t a1t_tbl_ncols(void* h) {
  return (int32_t)((Result*)h)->cols.size();
}
const char* a1t_tbl_col_name(void* h, int32_t c) {
  return ((Result*)h)->cols[c].name.c_str();
}
int32_t a1t_tbl_col_type(void* h, int32_t c) {
  return ((Result*)h)->cols[c].type;
}
const int64_t* a1t_tbl_col_i64(void* h, int32_t c) {
  return ((Result*)h)->cols[c].i64.data();
}
const double* a1t_tbl_col_f64(void* h, int32_t c) {
  return ((Result*)h)->cols[c].f64.data();
}
const uint8_t* a1t_tbl_col_bool(void* h, int32_t c) {
  return ((Result*)h)->cols[c].b8.data();
}
const int32_t* a1t_tbl_col_codes(void* h, int32_t c) {
  return ((Result*)h)->cols[c].codes.data();
}
int32_t a1t_tbl_col_nuniq(void* h, int32_t c) {
  return (int32_t)((Result*)h)->cols[c].offsets.size() - 1;
}
const int32_t* a1t_tbl_col_offsets(void* h, int32_t c) {
  return ((Result*)h)->cols[c].offsets.data();
}
const char* a1t_tbl_col_bytes(void* h, int32_t c) {
  return ((Result*)h)->cols[c].bytes.data();
}
int64_t a1t_tbl_col_nbytes(void* h, int32_t c) {
  return (int64_t)((Result*)h)->cols[c].bytes.size();
}
const uint8_t* a1t_tbl_col_valid(void* h, int32_t c) {
  return ((Result*)h)->cols[c].valid.data();
}
// nested (JSON one-level lists/structs; 0 / empty for flat columns)
int64_t a1t_tbl_col_noffsets(void* h, int32_t c) {
  return (int64_t)((Result*)h)->cols[c].list_offsets.size();
}
const int64_t* a1t_tbl_col_list_offsets(void* h, int32_t c) {
  return ((Result*)h)->cols[c].list_offsets.data();
}
const uint8_t* a1t_tbl_col_elem_valid(void* h, int32_t c) {
  return ((Result*)h)->cols[c].elem_valid.data();
}
const char* a1t_tbl_col_parent(void* h, int32_t c) {
  return ((Result*)h)->cols[c].parent.c_str();
}
void a1t_tbl_free(void* h) { delete (Result*)h; }

}  // extern "C"
