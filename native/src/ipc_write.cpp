// Arrow IPC file/stream WRITER in C++ — the producing half of the
// second-language binding (ipc_file.cpp is the consuming half).
// Written from scratch against the format spec (reference:
// docs/source/format/Columnar.rst "Serialization and Interprocess
// Communication", format/Message.fbs, format/Schema.fbs,
// format/File.fbs; framing per cpp/src/arrow/ipc/message.h:238 —
// encapsulated message = 0xFFFFFFFF continuation, int32 metadata size
// incl. padding, flatbuffer Message, 8-aligned body).
//
// Scope mirrors the reader: flat schemas of ints, floats, bool,
// utf8/binary (int32 offsets) and DICTIONARY-encoded var-binary
// columns (schema DictionaryEncoding + HDR_DICT value batches +
// footer dictionary blocks), with optional LSB-packed validity
// bitmaps. Emits either the file format (magic + messages + Footer +
// magic) or the stream format (messages + EOS). Good enough to hand
// C/C++-produced columnar data to pyarrow / arrow1_tpu zero-copy.
//
// The flatbuffer emission below is a minimal hand-rolled builder
// (bottom-up, offsets measured from the buffer end, exactly the
// discipline flatbuffers itself uses), the mirror of the hand-rolled
// vtable *walk* in ipc_file.cpp.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// type codes shared with ipc_file.cpp's C API
enum : int32_t {
  T_UNSUPPORTED = 0,
  T_I8 = 1, T_I16 = 2, T_I32 = 3, T_I64 = 4,
  T_U8 = 5, T_U16 = 6, T_U32 = 7, T_U64 = 8,
  T_F32 = 9, T_F64 = 10, T_BOOL = 11,
  T_STR = 12, T_BIN = 13,   // var-binary, int32 offsets
};

inline bool is_varbin(int32_t t) { return t == T_STR || t == T_BIN; }

// Schema.fbs Type union tags / Message.fbs header tags
constexpr uint8_t TYPE_INT = 2, TYPE_FP = 3, TYPE_BIN = 4,
                  TYPE_UTF8 = 5, TYPE_BOOL = 6;
constexpr uint8_t HDR_SCHEMA = 1, HDR_DICT = 2, HDR_BATCH = 3;
constexpr int16_t METADATA_V5 = 4;  // MetadataVersion enum value

int32_t type_width_bytes(int32_t t) {
  switch (t) {
    case T_I8: case T_U8: return 1;
    case T_I16: case T_U16: return 2;
    case T_I32: case T_U32: case T_F32: return 4;
    case T_I64: case T_U64: case T_F64: return 8;
    case T_BOOL: return 0;  // bit-packed
    case T_STR: case T_BIN: return -2;  // var-binary (offsets + data)
  }
  return -1;
}

// ---- minimal flatbuffer builder (builds backwards from a fixed end;
// object positions are recorded as distance-from-end so they stay
// stable while the front grows) ------------------------------------
class FBuilder {
 public:
  explicit FBuilder(size_t cap = 1 << 12) : buf_(cap, 0), head_(cap) {}

  uint64_t size() const { return buf_.size() - head_; }

  void push_bytes(const void* p, size_t n) {
    if (!n) return;
    ensure(n);
    head_ -= n;
    std::memcpy(&buf_[head_], p, n);
  }
  void pad(size_t n) {
    ensure(n);
    head_ -= n;
    std::memset(&buf_[head_], 0, n);
  }
  // pad so that after `extra` more bytes are pushed, size() % n == 0
  void align(size_t n, size_t extra = 0) {
    while ((size() + extra) % n) pad(1);
  }
  template <class T>
  void push(T v) {
    align(sizeof(T));
    push_bytes(&v, sizeof(T));
  }
  // uoffset field at the current head referring to object at end-offset
  // `o` (uoffset = target_addr - field_addr = field_end_off - o > 0
  // because children are pushed before their parents)
  void push_ref(uint64_t o) {
    align(4);
    uint32_t v = (uint32_t)(size() + 4 - o);
    push_bytes(&v, 4);
  }

  uint64_t create_string(const char* s, size_t len) {
    align(4, len + 1);      // u32 length lands 4-aligned, adjacent
    pad(1);                 // NUL terminator
    push_bytes(s, len);
    uint32_t n = (uint32_t)len;
    push_bytes(&n, 4);
    return size();
  }

  uint64_t create_ref_vector(const std::vector<uint64_t>& elems) {
    align(4, 4 * elems.size() + 4);
    for (size_t i = elems.size(); i-- > 0;) {
      uint32_t v = (uint32_t)(size() + 4 - elems[i]);
      push_bytes(&v, 4);
    }
    uint32_t n = (uint32_t)elems.size();
    push_bytes(&n, 4);
    return size();
  }

  // vector of fixed-size structs, pushed as one pre-laid-out blob
  uint64_t create_struct_vector(const void* data, size_t count,
                                size_t elem_size, size_t elem_align) {
    align(elem_align, count * elem_size);
    push_bytes(data, count * elem_size);
    align(4, 4);
    uint32_t n = (uint32_t)count;
    push_bytes(&n, 4);
    return size();
  }

  // ---- table building: push fields (any order), then end_table ----
  struct TableCtx {
    uint64_t o_start;                       // size() before any field
    std::vector<std::pair<int, uint64_t>> fields;  // (id, end-offset)
  };
  TableCtx start_table() { return TableCtx{size(), {}}; }

  template <class T>
  void table_scalar(TableCtx& t, int id, T v) {
    push<T>(v);
    t.fields.emplace_back(id, size());
  }
  void table_ref(TableCtx& t, int id, uint64_t o) {
    push_ref(o);
    t.fields.emplace_back(id, size());
  }

  uint64_t end_table(TableCtx& t) {
    int32_t z = 0;
    align(4);
    push_bytes(&z, 4);  // soffset placeholder at table start
    uint64_t o_table = size();
    int max_id = -1;
    for (auto& f : t.fields) max_id = f.first > max_id ? f.first : max_id;
    uint16_t nslots = (uint16_t)(max_id + 1);
    uint16_t vt_bytes = (uint16_t)(4 + 2 * nslots);
    std::vector<uint16_t> vt(2 + nslots, 0);
    vt[0] = vt_bytes;
    vt[1] = (uint16_t)(o_table - t.o_start);  // table size in bytes
    for (auto& f : t.fields)
      vt[2 + f.first] = (uint16_t)(o_table - f.second);
    align(2, vt_bytes);
    push_bytes(vt.data(), vt_bytes);
    uint64_t o_vt = size();
    // patch soffset: reader computes vt = tab - soff
    int32_t soff = (int32_t)(o_vt - o_table);
    std::memcpy(&buf_[buf_.size() - o_table], &soff, 4);
    return o_table;
  }

  // root uoffset + total size padded to 8 (keeps start-relative scalar
  // alignment identical to the end-relative alignment maintained above)
  std::vector<uint8_t> finish(uint64_t o_root) {
    align(8, 4);
    push_ref(o_root);
    return std::vector<uint8_t>(buf_.begin() + head_, buf_.end());
  }

 private:
  void ensure(size_t n) {
    if (head_ >= n) return;
    size_t grow = buf_.size() > n ? buf_.size() : n;
    std::vector<uint8_t> nb(buf_.size() + grow, 0);
    std::memcpy(nb.data() + grow + head_, buf_.data() + head_, size());
    head_ += grow;
    buf_.swap(nb);
  }

  std::vector<uint8_t> buf_;
  size_t head_;
};

// ---- writer state --------------------------------------------------
struct WCol {
  std::string name;
  int32_t type;      // value type (for dict columns: of the VALUES)
  bool nullable;
  int32_t dict_index = 0;  // 0 = plain; else index type (T_I8..T_I64)
  // dictionary values (var-binary), set once via a1t_ipcw_set_dict
  int64_t dict_rows = 0;
  std::vector<uint8_t> dict_offsets;  // (rows+1) * int32
  std::vector<uint8_t> dict_data;
};

struct WBatch {
  int64_t rows;
  // owned copies (caller buffers need not outlive the handle)
  std::vector<std::vector<uint8_t>> data;
  std::vector<std::vector<uint8_t>> offsets;  // var cols; empty = fixed
  std::vector<std::vector<uint8_t>> validity;  // packed LSB; empty = all valid
  std::vector<int64_t> null_count;
};

struct IpcWriter {
  std::vector<WCol> cols;
  std::vector<WBatch> batches;
  int err = 0;
};

uint64_t emit_int_type(FBuilder& b, int32_t t) {
  auto tt = b.start_table();  // Int { bitWidth: int, is_signed: bool }
  bool sign = t >= T_I8 && t <= T_I64;
  b.table_scalar<int32_t>(tt, 0, 8 * type_width_bytes(t));
  b.table_scalar<uint8_t>(tt, 1, sign ? 1 : 0);
  return b.end_table(tt);
}

// Field table: name(0) nullable(1) type_type(2) type(3) dictionary(4)
// children(5). `fidx` = the field's column index (used as dictionary id)
uint64_t emit_field(FBuilder& b, const WCol& c, int64_t fidx) {
  uint64_t o_name = b.create_string(c.name.data(), c.name.size());
  uint64_t o_dict = 0;
  if (c.dict_index) {
    // DictionaryEncoding: id(0) i64, indexType(1) Int
    uint64_t o_it = emit_int_type(b, c.dict_index);
    auto dt = b.start_table();
    b.table_ref(dt, 1, o_it);
    b.table_scalar<int64_t>(dt, 0, fidx);
    o_dict = b.end_table(dt);
  }
  uint64_t o_type;
  uint8_t tag;
  if (c.type == T_BOOL) {
    auto t = b.start_table();  // Bool {} — empty table
    o_type = b.end_table(t);
    tag = TYPE_BOOL;
  } else if (c.type == T_STR || c.type == T_BIN) {
    auto t = b.start_table();  // Utf8 {} / Binary {} — empty tables
    o_type = b.end_table(t);
    tag = c.type == T_STR ? TYPE_UTF8 : TYPE_BIN;
  } else if (c.type == T_F32 || c.type == T_F64) {
    auto t = b.start_table();  // FloatingPoint { precision: short }
    b.table_scalar<int16_t>(t, 0, c.type == T_F64 ? 2 : 1);
    o_type = b.end_table(t);
    tag = TYPE_FP;
  } else {
    o_type = emit_int_type(b, c.type);
    tag = TYPE_INT;
  }
  uint64_t o_children = b.create_ref_vector({});  // explicit empty vec
  auto f = b.start_table();
  b.table_ref(f, 5, o_children);
  if (o_dict) b.table_ref(f, 4, o_dict);
  b.table_ref(f, 3, o_type);
  b.table_scalar<uint8_t>(f, 2, tag);
  b.table_scalar<uint8_t>(f, 1, c.nullable ? 1 : 0);
  b.table_ref(f, 0, o_name);
  return b.end_table(f);
}

// Schema table: endianness(0)=Little, fields(1)
uint64_t emit_schema_table(FBuilder& b, const std::vector<WCol>& cols) {
  std::vector<uint64_t> fo;
  fo.reserve(cols.size());
  for (size_t i = 0; i < cols.size(); i++)
    fo.push_back(emit_field(b, cols[i], (int64_t)i));
  uint64_t o_fields = b.create_ref_vector(fo);
  auto s = b.start_table();
  b.table_ref(s, 1, o_fields);
  return b.end_table(s);
}

// Message table: version(0) header_type(1) header(2) bodyLength(3)
std::vector<uint8_t> emit_message(uint8_t hdr_tag, int64_t body_len,
                                  uint64_t o_header, FBuilder& b) {
  auto m = b.start_table();
  b.table_scalar<int64_t>(m, 3, body_len);
  b.table_ref(m, 2, o_header);
  b.table_scalar<uint8_t>(m, 1, hdr_tag);
  b.table_scalar<int16_t>(m, 0, METADATA_V5);
  return b.finish(b.end_table(m));
}

void put_u32(std::vector<uint8_t>& out, uint32_t v) {
  out.insert(out.end(), (uint8_t*)&v, (uint8_t*)&v + 4);
}
void put_i32(std::vector<uint8_t>& out, int32_t v) {
  out.insert(out.end(), (uint8_t*)&v, (uint8_t*)&v + 4);
}

// encapsulated message: continuation + padded metadata len + fb + body;
// returns metadata length (prefix included, per ipc/message.h)
int32_t put_encapsulated(std::vector<uint8_t>& out,
                         const std::vector<uint8_t>& fb) {
  uint64_t padded = (fb.size() + 7) / 8 * 8;
  put_u32(out, 0xFFFFFFFFu);
  put_i32(out, (int32_t)padded);
  out.insert(out.end(), fb.begin(), fb.end());
  out.resize(out.size() + (padded - fb.size()), 0);
  return (int32_t)(8 + padded);
}

struct BodyPlan {
  // per column: (validity offset/len, data offset/len), 64-aligned
  std::vector<int64_t> vals;  // flattened Buffer structs {off,len}
  int64_t body_len = 0;
};

BodyPlan plan_body(const WBatch& wb) {
  BodyPlan p;
  int64_t pos = 0;
  auto add = [&](uint64_t len) {
    int64_t off = pos;
    pos += (int64_t)((len + 63) / 64 * 64);
    p.vals.push_back(off);
    p.vals.push_back((int64_t)len);
  };
  for (size_t c = 0; c < wb.data.size(); c++) {
    add(wb.validity[c].size());
    if (!wb.offsets[c].empty()) add(wb.offsets[c].size());
    add(wb.data[c].size());
  }
  p.body_len = pos;
  return p;
}

// RecordBatch table: length(0) nodes(1) buffers(2). Struct vectors are
// created BEFORE start_table: vt[1] (inline table byte size) is
// measured from o_start, so blobs created inside the table window
// would inflate it (and wrap uint16 for ~1400+ columns) — strict
// flatbuffer verifiers (Arrow Java/Go) reject such metadata
uint64_t emit_batch_table(FBuilder& b, const WBatch& wb,
                          const BodyPlan& plan) {
  // FieldNode structs {i64 length, i64 null_count}, one blob in order
  std::vector<int64_t> nodes;
  for (auto nc : wb.null_count) {
    nodes.push_back(wb.rows);
    nodes.push_back(nc);
  }
  std::vector<int64_t> bufs = plan.vals;
  uint64_t o_bufs = b.create_struct_vector(bufs.data(), bufs.size() / 2,
                                           16, 8);
  uint64_t o_nodes = b.create_struct_vector(nodes.data(), nodes.size() / 2,
                                            16, 8);
  auto rb = b.start_table();
  b.table_ref(rb, 2, o_bufs);
  b.table_ref(rb, 1, o_nodes);
  b.table_scalar<int64_t>(rb, 0, wb.rows);
  return b.end_table(rb);
}

std::vector<uint8_t> emit_batch_message(const std::vector<WCol>& cols,
                                        const WBatch& wb,
                                        const BodyPlan& plan) {
  FBuilder b;
  return emit_message(HDR_BATCH, plan.body_len,
                      emit_batch_table(b, wb, plan), b);
}

// DictionaryBatch message: id(0), data(1) RecordBatch, isDelta(2)
std::vector<uint8_t> emit_dict_message(int64_t id, const WBatch& wb,
                                       const BodyPlan& plan) {
  FBuilder b;
  uint64_t o_rb = emit_batch_table(b, wb, plan);
  auto db = b.start_table();
  b.table_ref(db, 1, o_rb);
  b.table_scalar<int64_t>(db, 0, id);
  return emit_message(HDR_DICT, plan.body_len, b.end_table(db), b);
}

void put_body(std::vector<uint8_t>& out, const WBatch& wb,
              const BodyPlan& plan) {
  size_t base = out.size();
  out.resize(base + (size_t)plan.body_len, 0);
  size_t bi = 0;
  auto put = [&](const std::vector<uint8_t>& buf) {
    int64_t off = plan.vals[bi * 2];
    bi += 1;
    if (!buf.empty()) std::memcpy(&out[base + off], buf.data(),
                                  buf.size());
  };
  for (size_t c = 0; c < wb.data.size(); c++) {
    put(wb.validity[c]);
    if (!wb.offsets[c].empty()) put(wb.offsets[c]);
    put(wb.data[c]);
  }
}

// a WBatch holding one dictionary's values (single var-binary column)
WBatch dict_values_batch(const WCol& c) {
  WBatch b;
  b.rows = c.dict_rows;
  b.data.push_back(c.dict_data);
  b.offsets.push_back(c.dict_offsets);
  b.validity.emplace_back();
  b.null_count.push_back(0);
  return b;
}

}  // namespace

extern "C" {

void* a1t_ipcw_new() { return new IpcWriter(); }

void a1t_ipcw_close(void* h) { delete (IpcWriter*)h; }

int32_t a1t_ipcw_err(void* h) { return ((IpcWriter*)h)->err; }

// type_code: the T_* codes above (shared with a1t_ipc_col_type)
int32_t a1t_ipcw_add_col(void* h, const char* name, int32_t type_code,
                         int32_t nullable) {
  auto* w = (IpcWriter*)h;
  if (!w->batches.empty()) { w->err = 4; return -1; }
  if (type_width_bytes(type_code) == -1 && type_code != T_BOOL) {
    w->err = 5;
    return -1;
  }
  WCol c;
  c.name = name ? name : "";
  c.type = type_code;
  c.nullable = nullable != 0;
  w->cols.push_back(std::move(c));
  return (int32_t)w->cols.size() - 1;
}

// dictionary-encoded column: values are var-binary (T_STR/T_BIN, set
// once via a1t_ipcw_set_dict), per-batch data holds the INDICES
// (index_type: T_I8..T_I64 / unsigned)
int32_t a1t_ipcw_add_dict_col(void* h, const char* name,
                              int32_t value_type, int32_t index_type,
                              int32_t nullable) {
  auto* w = (IpcWriter*)h;
  if (!w->batches.empty()) { w->err = 4; return -1; }
  if (!is_varbin(value_type) || type_width_bytes(index_type) <= 0) {
    w->err = 5;
    return -1;
  }
  WCol c;
  c.name = name ? name : "";
  c.type = value_type;
  c.nullable = nullable != 0;
  c.dict_index = index_type;
  w->cols.push_back(std::move(c));
  return (int32_t)w->cols.size() - 1;
}

// the dictionary's values: n entries, int32 offsets[n+1], byte data
int32_t a1t_ipcw_set_dict(void* h, int32_t col, int64_t n,
                          const int32_t* offsets, const uint8_t* data) {
  auto* w = (IpcWriter*)h;
  if (col < 0 || (size_t)col >= w->cols.size() ||
      !w->cols[col].dict_index || n < 0 || !offsets) {
    w->err = 5;
    return -1;
  }
  auto& c = w->cols[col];
  c.dict_rows = n;
  c.dict_offsets.assign((const uint8_t*)offsets,
                        (const uint8_t*)(offsets + n + 1));
  int64_t dlen = offsets[n];
  if (dlen < 0 || (dlen > 0 && !data)) { w->err = 5; return -1; }
  c.dict_data.assign(data, data + dlen);
  return 0;
}

// data[i]: column i's values (bit-packed LSB for bool, indices for
// dictionary columns, else width*rows bytes; for PLAIN var-binary
// columns the bytes with offsets[i] giving the int32 offsets
// (rows+1)). offsets[i] must be NULL for fixed-width/dict columns.
// validity[i]: LSB-packed bitmap or NULL (all valid); null_count[i]
// ignored when validity[i] is NULL.
int32_t a1t_ipcw_add_batch2(void* h, int64_t rows, const uint8_t** data,
                            const uint8_t** offsets,
                            const uint8_t** validity,
                            const int64_t* null_count) {
  auto* w = (IpcWriter*)h;
  if (w->cols.empty() || rows < 0) { w->err = 6; return -1; }
  WBatch b;
  b.rows = rows;
  uint64_t vlen = (uint64_t)((rows + 7) / 8);
  for (size_t c = 0; c < w->cols.size(); c++) {
    auto& col = w->cols[c];
    int32_t width = col.dict_index ? type_width_bytes(col.dict_index)
                                   : type_width_bytes(col.type);
    uint64_t dlen;
    if (width == -2) {               // plain var-binary
      if (!offsets || !offsets[c]) { w->err = 6; return -1; }
      const int32_t* ofs = (const int32_t*)offsets[c];
      if (ofs[rows] < 0) { w->err = 6; return -1; }
      b.offsets.emplace_back(offsets[c],
                             offsets[c] + (rows + 1) * 4);
      dlen = (uint64_t)ofs[rows];
    } else {
      if (offsets && offsets[c]) { w->err = 6; return -1; }
      b.offsets.emplace_back();
      dlen = width == 0 ? vlen : (uint64_t)rows * (uint64_t)width;
    }
    if (!data || (!data[c] && dlen)) { w->err = 6; return -1; }
    b.data.emplace_back(data[c], data[c] + dlen);
    if (validity && validity[c]) {
      b.validity.emplace_back(validity[c], validity[c] + vlen);
      if (null_count) {
        b.null_count.push_back(null_count[c]);
      } else {
        // spec defines null_count as the observed count (writing -1
        // "unknown" trips implementations that mishandle negatives):
        // popcount the bitmap over the first `rows` bits
        int64_t set = 0;
        for (int64_t i = 0; i < rows; i++)
          set += (validity[c][i >> 3] >> (i & 7)) & 1;
        b.null_count.push_back(rows - set);
      }
    } else {
      b.validity.emplace_back();
      b.null_count.push_back(0);
    }
  }
  w->batches.push_back(std::move(b));
  return (int32_t)w->batches.size() - 1;
}

int32_t a1t_ipcw_add_batch(void* h, int64_t rows, const uint8_t** data,
                           const uint8_t** validity,
                           const int64_t* null_count) {
  return a1t_ipcw_add_batch2(h, rows, data, nullptr, validity,
                             null_count);
}

// Serialize. stream_mode=0: file format (magic + Footer), 1: stream
// format (EOS-terminated). Returns a malloc'd buffer the caller frees
// with a1t_ipcw_free_buf.
uint8_t* a1t_ipcw_finish(void* h, int32_t stream_mode, uint64_t* out_len) {
  auto* w = (IpcWriter*)h;
  if (out_len) *out_len = 0;
  if (w->cols.empty()) { w->err = 6; return nullptr; }
  std::vector<uint8_t> out;
  if (!stream_mode) out.insert(out.end(), {'A','R','R','O','W','1',0,0});

  for (auto& c : w->cols)
    if (c.dict_index && c.dict_offsets.empty()) {
      w->err = 8;  // dictionary column without a1t_ipcw_set_dict
      return nullptr;
    }

  {
    FBuilder b;
    auto fb = emit_message(HDR_SCHEMA, 0, emit_schema_table(b, w->cols), b);
    put_encapsulated(out, fb);
  }

  // Block structs for the Footer: {i64 offset, i32 metaDataLength,
  // 4 pad, i64 bodyLength} = 24 bytes
  std::vector<int64_t> dict_blocks;
  for (size_t c = 0; c < w->cols.size(); c++) {
    if (!w->cols[c].dict_index) continue;
    WBatch dwb = dict_values_batch(w->cols[c]);
    BodyPlan plan = plan_body(dwb);
    int64_t off = (int64_t)out.size();
    auto fb = emit_dict_message((int64_t)c, dwb, plan);
    int32_t meta_len = put_encapsulated(out, fb);
    put_body(out, dwb, plan);
    dict_blocks.push_back(off);
    dict_blocks.push_back((int64_t)(uint32_t)meta_len);
    dict_blocks.push_back(plan.body_len);
  }

  std::vector<int64_t> blocks;  // 3 slots per block (pad lives in slot 2)
  for (auto& wb : w->batches) {
    BodyPlan plan = plan_body(wb);
    int64_t off = (int64_t)out.size();
    auto fb = emit_batch_message(w->cols, wb, plan);
    int32_t meta_len = put_encapsulated(out, fb);
    put_body(out, wb, plan);
    blocks.push_back(off);
    blocks.push_back((int64_t)(uint32_t)meta_len);  // i32 + zero pad
    blocks.push_back(plan.body_len);
  }

  // end-of-stream marker (both formats; readers at the footer skip it)
  put_u32(out, 0xFFFFFFFFu);
  put_u32(out, 0);

  if (!stream_mode) {
    FBuilder b;
    uint64_t o_schema = emit_schema_table(b, w->cols);
    uint64_t o_blocks = b.create_struct_vector(
        blocks.data(), blocks.size() / 3, 24, 8);
    uint64_t o_dicts = b.create_struct_vector(
        dict_blocks.data(), dict_blocks.size() / 3, 24, 8);
    auto f = b.start_table();  // Footer: version(0) schema(1)
    b.table_ref(f, 3, o_blocks);  // recordBatches(3), dictionaries(2)
    b.table_ref(f, 2, o_dicts);
    b.table_ref(f, 1, o_schema);
    b.table_scalar<int16_t>(f, 0, METADATA_V5);
    auto fb = b.finish(b.end_table(f));
    out.insert(out.end(), fb.begin(), fb.end());
    put_i32(out, (int32_t)fb.size());
    out.insert(out.end(), {'A','R','R','O','W','1'});
  }

  auto* buf = (uint8_t*)::malloc(out.size());
  if (!buf) { w->err = 7; return nullptr; }
  std::memcpy(buf, out.data(), out.size());
  if (out_len) *out_len = out.size();
  return buf;
}

void a1t_ipcw_free_buf(uint8_t* p) { ::free(p); }

}  // extern "C"
