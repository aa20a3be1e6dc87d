// Shared columnar result for native host-side file readers (CSV, JSON).
//
// The reader fills typed per-column vectors; Python consumes them
// zero-copy via the a1t_tbl_* accessors (one C ABI for every reader).
// String columns are dictionary-encoded at parse time (codes + unique
// value pool) because that is the engine's device-side string form.

#pragma once

#include <cstdint>
#include <string>
#include <vector>

namespace a1t {

enum TypeCode : int32_t {
  T_NULL = 0,
  T_INT64 = 1,
  T_BOOL = 2,
  T_FLOAT64 = 3,
  T_STRING = 4,
  // list NODE: list_offsets over this column's slots; the single
  // child column (name "<name>.$", parent = name) carries the
  // flattened elements — nesting recurses to any depth (JSON)
  T_LIST = 5,
  // CSV inference promotions (csv/inference_internal.h chain);
  // values ride the i64 vector (days / seconds / nanoseconds)
  T_DATE32 = 6,
  T_TS_S = 7,
  T_TS_NS = 8,
};

struct Column {
  std::string name;
  int32_t type = T_NULL;
  std::vector<int64_t> i64;
  std::vector<double> f64;
  std::vector<uint8_t> b8;
  std::vector<int32_t> codes;    // string: per-row dictionary code
  std::vector<int32_t> offsets;  // string: unique-value offsets
  std::vector<char> bytes;       // string: unique-value bytes
  std::vector<uint8_t> valid;    // row validity (nrows)
  // one-level nested results (JSON):
  // list column: type = ELEMENT type, typed vectors hold the flattened
  // elements, list_offsets has nrows+1 entries, valid stays row-level
  // and elem_valid covers the elements.
  std::vector<int64_t> list_offsets;
  std::vector<uint8_t> elem_valid;
  // struct child: this column is a flattened "parent.key" child; the
  // parent column itself is a T_NULL presence column of the same name.
  std::string parent;
};

struct Result {
  int64_t nrows = 0;
  std::vector<Column> cols;
  std::string error;
};

}  // namespace a1t
