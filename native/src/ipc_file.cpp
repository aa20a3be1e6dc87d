// Arrow IPC file/stream reader in C++ — a second-language consumer of
// the wire format, written from scratch against the format spec
// (reference: docs/source/format/Columnar.rst "Serialization and
// Interprocess Communication", format/Message.fbs, format/Schema.fbs;
// framing per cpp/src/arrow/ipc/message.h:238 — encapsulated message =
// 0xFFFFFFFF continuation, int32 metadata size incl. padding,
// flatbuffer Message, 8-aligned body).
//
// Scope: flat schemas of ints, floats, bool, utf8/binary (32- and
// 64-bit offsets) and DICTIONARY-encoded var-binary (the engine's
// string form) — enough to hand arrow1_tpu- or pyarrow-written files
// to C/C++ callers zero-copy (per-type coverage mirrors
// cpp/src/arrow/ipc/reader.cc:138 ArrayLoader for these types).
// Nested columns surface type code 0 (caller falls back); compressed
// bodies and dictionary deltas are rejected via a1t_ipc_err.
//
// The flatbuffer walk below is hand-rolled (vtable lookups only), the
// same approach as the hand-built *writer* in io/ipc_native.py.

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct FB {
  const uint8_t* buf;
  uint64_t len;

  bool ok(uint64_t pos, uint64_t need) const {
    return pos + need <= len && pos + need >= pos;
  }
  uint16_t u16(uint64_t pos) const {
    uint16_t v;
    std::memcpy(&v, buf + pos, 2);
    return v;
  }
  uint32_t u32(uint64_t pos) const {
    uint32_t v;
    std::memcpy(&v, buf + pos, 4);
    return v;
  }
  int32_t i32(uint64_t pos) const {
    int32_t v;
    std::memcpy(&v, buf + pos, 4);
    return v;
  }
  int64_t i64(uint64_t pos) const {
    int64_t v;
    std::memcpy(&v, buf + pos, 8);
    return v;
  }

  // table at `tab`: field voffset for id, or 0 if absent
  uint64_t field(uint64_t tab, int id) const {
    if (!ok(tab, 4)) return 0;
    int32_t soff = i32(tab);
    uint64_t vt = (uint64_t)((int64_t)tab - soff);
    if (!ok(vt, 4)) return 0;
    uint16_t vtsize = u16(vt);
    uint64_t slot = 4 + 2 * (uint64_t)id;
    if (slot + 2 > vtsize) return 0;
    uint16_t voff = u16(vt + slot);
    if (voff == 0) return 0;
    return tab + voff;
  }
  // follow a uoffset at pos
  uint64_t indirect(uint64_t pos) const {
    if (!ok(pos, 4)) return 0;
    return pos + u32(pos);
  }
  int64_t scalar_i64(uint64_t tab, int id, int64_t dflt) const {
    uint64_t p = field(tab, id);
    return p ? i64(p) : dflt;
  }
  int32_t scalar_i32(uint64_t tab, int id, int32_t dflt) const {
    uint64_t p = field(tab, id);
    return p ? i32(p) : dflt;
  }
  int16_t scalar_i16(uint64_t tab, int id, int16_t dflt) const {
    uint64_t p = field(tab, id);
    return p ? (int16_t)u16(p) : dflt;
  }
  uint8_t scalar_u8(uint64_t tab, int id, uint8_t dflt) const {
    uint64_t p = field(tab, id);
    return p ? buf[p] : dflt;
  }
  std::string str(uint64_t tab, int id) const {
    uint64_t p = field(tab, id);
    if (!p) return "";
    uint64_t s = indirect(p);
    if (!ok(s, 4)) return "";
    uint32_t n = u32(s);
    if (!ok(s + 4, n)) return "";
    return std::string((const char*)buf + s + 4, n);
  }
};

// type codes exposed to the caller (0 = unsupported here)
enum ColType {
  T_UNSUPPORTED = 0,
  T_I8 = 1, T_I16 = 2, T_I32 = 3, T_I64 = 4,
  T_U8 = 5, T_U16 = 6, T_U32 = 7, T_U64 = 8,
  T_F32 = 9, T_F64 = 10, T_BOOL = 11,
  // var-binary (validity, int32 offsets, data) — Columnar.rst:104
  T_STR = 12, T_BIN = 13,
  // 64-bit-offset variants
  T_LSTR = 14, T_LBIN = 15,
};

inline bool is_varbin(int32_t t) {
  return t == T_STR || t == T_BIN || t == T_LSTR || t == T_LBIN;
}

struct Col {
  std::string name;
  int32_t type = T_UNSUPPORTED;   // value type (for dict: of the VALUES)
  bool nullable = true;
  int64_t dict_id = -1;           // >= 0: dictionary-encoded column
  int32_t index_type = 0;         // dict index type (T_I8..T_I64/u)
};

struct Batch {
  int64_t rows = 0;
  // per column: pointers into the file body
  std::vector<const uint8_t*> data;
  std::vector<uint64_t> data_len;
  std::vector<const uint8_t*> offsets;   // var-binary only, else NULL
  std::vector<uint64_t> offsets_len;
  std::vector<const uint8_t*> validity;
  std::vector<uint64_t> validity_len;
  std::vector<int64_t> null_count;
};

// one dictionary's values (a single-column record batch body)
struct DictVals {
  int64_t rows = 0;
  int32_t type = T_UNSUPPORTED;
  const uint8_t* offsets = nullptr;
  uint64_t offsets_len = 0;
  const uint8_t* data = nullptr;
  uint64_t data_len = 0;
  const uint8_t* validity = nullptr;
  uint64_t validity_len = 0;
};

struct IpcFile {
  std::vector<Col> cols;
  std::vector<Batch> batches;
  std::vector<std::pair<int64_t, DictVals>> dicts;
  int err = 0;  // 0 ok; 1 parse error; 2 compressed body; 3 no schema
                // 4 dictionary delta unsupported

  const DictVals* dict_for(int64_t id) const {
    for (auto& d : dicts)
      if (d.first == id) return &d.second;
    return nullptr;
  }
};

// Schema.fbs Type union tags
constexpr uint8_t TYPE_INT = 2, TYPE_FP = 3, TYPE_BIN = 4,
                  TYPE_UTF8 = 5, TYPE_BOOL = 6, TYPE_LBIN = 19,
                  TYPE_LUTF8 = 20;
// Message.fbs header union tags
constexpr uint8_t HDR_SCHEMA = 1, HDR_DICT = 2, HDR_BATCH = 3;

int32_t decode_type(const FB& fb, uint8_t tag, uint64_t type_tab) {
  if (tag == TYPE_BOOL) return T_BOOL;
  if (tag == TYPE_UTF8) return T_STR;
  if (tag == TYPE_BIN) return T_BIN;
  if (tag == TYPE_LUTF8) return T_LSTR;
  if (tag == TYPE_LBIN) return T_LBIN;
  if (tag == TYPE_INT) {
    int32_t bits = fb.scalar_i32(type_tab, 0, 0);
    bool sign = fb.scalar_u8(type_tab, 1, 0) != 0;
    switch (bits) {
      case 8: return sign ? T_I8 : T_U8;
      case 16: return sign ? T_I16 : T_U16;
      case 32: return sign ? T_I32 : T_U32;
      case 64: return sign ? T_I64 : T_U64;
    }
    return T_UNSUPPORTED;
  }
  if (tag == TYPE_FP) {
    // Precision is a flatbuffers `short` enum: 0 half 1 single 2 double
    int16_t prec = fb.scalar_i16(type_tab, 0, 0);
    if (prec == 1) return T_F32;
    if (prec == 2) return T_F64;
    return T_UNSUPPORTED;
  }
  return T_UNSUPPORTED;
}

bool parse_schema(const FB& msg, uint64_t schema_tab, IpcFile* f) {
  uint64_t fields_off = msg.field(schema_tab, 1);
  if (!fields_off) return false;
  uint64_t vec = msg.indirect(fields_off);
  if (!msg.ok(vec, 4)) return false;
  uint32_t n = msg.u32(vec);
  for (uint32_t i = 0; i < n; i++) {
    uint64_t el = vec + 4 + 4ull * i;
    uint64_t ftab = msg.indirect(el);
    if (!ftab) return false;
    Col c;
    c.name = msg.str(ftab, 0);
    c.nullable = msg.scalar_u8(ftab, 1, 0) != 0;
    uint8_t tag = msg.scalar_u8(ftab, 2, 0);
    uint64_t type_off = msg.field(ftab, 3);
    uint64_t type_tab = type_off ? msg.indirect(type_off) : 0;
    // nested columns (children) are out of scope here
    uint64_t children_off = msg.field(ftab, 5);
    bool has_children = false;
    if (children_off) {
      uint64_t cv = msg.indirect(children_off);
      has_children = msg.ok(cv, 4) && msg.u32(cv) > 0;
    }
    c.type = has_children ? T_UNSUPPORTED
                          : decode_type(msg, tag, type_tab);
    uint64_t dict_off = msg.field(ftab, 4);
    if (dict_off && c.type != T_UNSUPPORTED) {
      // DictionaryEncoding: id(0) i64, indexType(1) Int table
      uint64_t dtab = msg.indirect(dict_off);
      c.dict_id = msg.scalar_i64(dtab, 0, 0);
      uint64_t it_off = msg.field(dtab, 1);
      if (it_off) {
        uint64_t itab = msg.indirect(it_off);
        c.index_type = decode_type(msg, TYPE_INT, itab);
      } else {
        c.index_type = T_I32;  // spec default: signed int32
      }
      if (c.index_type == T_UNSUPPORTED) c.type = T_UNSUPPORTED;
    }
    f->cols.push_back(std::move(c));
  }
  return true;
}

// Walk a RecordBatch table's nodes/buffers for columns of the given
// PHYSICAL types (dict columns pass their index type). Fills `b`.
bool load_cols(const FB& msg, uint64_t rb_tab, const uint8_t* body,
               uint64_t body_len, const std::vector<int32_t>& types,
               Batch* b, int* err) {
  if (msg.field(rb_tab, 3)) {  // BodyCompression present
    *err = 2;
    return false;
  }
  b->rows = msg.scalar_i64(rb_tab, 0, 0);
  uint64_t nodes_off = msg.field(rb_tab, 1);
  uint64_t bufs_off = msg.field(rb_tab, 2);
  if (!nodes_off || !bufs_off) return false;
  uint64_t nodes = msg.indirect(nodes_off);
  uint64_t bufs = msg.indirect(bufs_off);
  if (!msg.ok(nodes, 4) || !msg.ok(bufs, 4)) return false;
  uint32_t nnodes = msg.u32(nodes);
  uint32_t nbufs = msg.u32(bufs);
  if (nnodes < types.size()) return false;
  uint64_t node_base = nodes + 4;   // FieldNode struct: i64 len, i64 nulls
  uint64_t buf_base = bufs + 4;     // Buffer struct: i64 offset, i64 len
  uint32_t bi = 0;
  auto grab = [&](uint32_t i, const uint8_t** p, uint64_t* plen) {
    int64_t off = msg.i64(buf_base + 16ull * i);
    int64_t blen = msg.i64(buf_base + 16ull * i + 8);
    if (off < 0 || blen < 0 || (uint64_t)(off + blen) > body_len)
      return false;
    *p = blen > 0 ? body + off : nullptr;
    *plen = (uint64_t)blen;
    return true;
  };
  for (size_t c = 0; c < types.size(); c++) {
    int64_t nulls = msg.i64(node_base + 16ull * c + 8);
    b->null_count.push_back(nulls);
    uint32_t need = is_varbin(types[c]) ? 3 : 2;
    if (bi + need > nbufs) return false;
    const uint8_t* p = nullptr;
    uint64_t plen = 0;
    if (!grab(bi++, &p, &plen)) return false;
    b->validity.push_back(p);
    b->validity_len.push_back(plen);
    if (need == 3) {
      if (!grab(bi++, &p, &plen)) return false;
      b->offsets.push_back(p);
      b->offsets_len.push_back(plen);
    } else {
      b->offsets.push_back(nullptr);
      b->offsets_len.push_back(0);
    }
    if (!grab(bi++, &p, &plen)) return false;
    // validity may alias... keep data even when empty (offset valid)
    b->data.push_back(p ? p : body);
    b->data_len.push_back(plen);
  }
  return true;
}

bool parse_batch(const FB& msg, uint64_t rb_tab, const uint8_t* body,
                 uint64_t body_len, IpcFile* f) {
  std::vector<int32_t> types;
  for (auto& c : f->cols)
    types.push_back(c.dict_id >= 0 ? c.index_type : c.type);
  Batch b;
  if (!load_cols(msg, rb_tab, body, body_len, types, &b, &f->err))
    return false;
  f->batches.push_back(std::move(b));
  return true;
}

// DictionaryBatch: id(0) i64, data(1) RecordBatch, isDelta(2) bool
bool parse_dict(const FB& msg, uint64_t db_tab, const uint8_t* body,
                uint64_t body_len, IpcFile* f) {
  int64_t id = msg.scalar_i64(db_tab, 0, 0);
  if (msg.scalar_u8(db_tab, 2, 0) != 0) {  // isDelta
    f->err = 4;
    return false;
  }
  uint64_t rb_off = msg.field(db_tab, 1);
  if (!rb_off) return false;
  uint64_t rb_tab = msg.indirect(rb_off);
  // the value type of any field using this dictionary id
  int32_t vt = T_UNSUPPORTED;
  for (auto& c : f->cols)
    if (c.dict_id == id) vt = c.type;
  if (vt == T_UNSUPPORTED) return true;  // unused dictionary: skip
  Batch b;
  std::vector<int32_t> types{vt};
  if (!load_cols(msg, rb_tab, body, body_len, types, &b, &f->err))
    return false;
  DictVals dv;
  dv.rows = b.rows;
  dv.type = vt;
  dv.offsets = b.offsets[0];
  dv.offsets_len = b.offsets_len[0];
  dv.data = b.data[0];
  dv.data_len = b.data_len[0];
  dv.validity = b.validity[0];
  dv.validity_len = b.validity_len[0];
  f->dicts.emplace_back(id, dv);
  return true;
}

}  // namespace

extern "C" {

void* a1t_ipc_open(const uint8_t* data, uint64_t len) {
  auto* f = new IpcFile();
  uint64_t pos = 0;
  // file format starts with "ARROW1\0\0"; stream format starts at the
  // first message — accept both
  if (len >= 8 && std::memcmp(data, "ARROW1\0\0", 8) == 0) pos = 8;
  bool have_schema = false;
  while (pos + 8 <= len) {
    FB whole{data, len};
    uint32_t first = whole.u32(pos);
    uint32_t meta_len;
    uint64_t meta_pos;
    if (first == 0xFFFFFFFFu) {
      meta_len = whole.u32(pos + 4);
      meta_pos = pos + 8;
    } else {                       // pre-0.15 framing (no continuation)
      meta_len = first;
      meta_pos = pos + 4;
    }
    if (meta_len == 0) break;      // end-of-stream marker (or footer next)
    if (!whole.ok(meta_pos, meta_len)) break;
    FB msg{data + meta_pos, meta_len};
    uint64_t root = msg.indirect(0);
    uint8_t hdr_tag = msg.scalar_u8(root, 1, 0);
    uint64_t hdr_off = msg.field(root, 2);
    int64_t body_len = msg.scalar_i64(root, 3, 0);
    uint64_t body_pos = meta_pos + meta_len;
    if (body_len < 0 || !whole.ok(body_pos, (uint64_t)body_len)) break;
    if (hdr_off) {
      uint64_t hdr_tab = msg.indirect(hdr_off);
      if (hdr_tag == HDR_SCHEMA && !have_schema) {
        if (!parse_schema(msg, hdr_tab, f)) {
          f->err = 1;
          return f;
        }
        have_schema = true;
      } else if (hdr_tag == HDR_BATCH && have_schema) {
        if (!parse_batch(msg, hdr_tab, data + body_pos,
                         (uint64_t)body_len, f)) {
          if (!f->err) f->err = 1;
          return f;
        }
      } else if (hdr_tag == HDR_DICT && have_schema) {
        if (!parse_dict(msg, hdr_tab, data + body_pos,
                        (uint64_t)body_len, f)) {
          if (!f->err) f->err = 1;
          return f;
        }
      }
    }
    pos = body_pos + (uint64_t)body_len;
  }
  if (!have_schema) f->err = 3;
  return f;
}

int32_t a1t_ipc_err(void* h) { return ((IpcFile*)h)->err; }

void a1t_ipc_close(void* h) { delete (IpcFile*)h; }

int32_t a1t_ipc_ncols(void* h) {
  return (int32_t)((IpcFile*)h)->cols.size();
}

int32_t a1t_ipc_nbatches(void* h) {
  return (int32_t)((IpcFile*)h)->batches.size();
}

const char* a1t_ipc_col_name(void* h, int32_t i) {
  auto* f = (IpcFile*)h;
  if (i < 0 || (size_t)i >= f->cols.size()) return "";
  return f->cols[i].name.c_str();
}

int32_t a1t_ipc_col_type(void* h, int32_t i) {
  auto* f = (IpcFile*)h;
  if (i < 0 || (size_t)i >= f->cols.size()) return 0;
  return f->cols[i].type;
}

int64_t a1t_ipc_batch_rows(void* h, int32_t b) {
  auto* f = (IpcFile*)h;
  if (b < 0 || (size_t)b >= f->batches.size()) return -1;
  return f->batches[b].rows;
}

const uint8_t* a1t_ipc_col_data(void* h, int32_t b, int32_t c,
                                uint64_t* out_len) {
  auto* f = (IpcFile*)h;
  if (b < 0 || (size_t)b >= f->batches.size()) return nullptr;
  auto& bb = f->batches[b];
  if (c < 0 || (size_t)c >= bb.data.size()) return nullptr;
  if (out_len) *out_len = bb.data_len[c];
  return bb.data[c];
}

const uint8_t* a1t_ipc_col_validity(void* h, int32_t b, int32_t c,
                                    uint64_t* out_len) {
  auto* f = (IpcFile*)h;
  if (b < 0 || (size_t)b >= f->batches.size()) return nullptr;
  auto& bb = f->batches[b];
  if (c < 0 || (size_t)c >= bb.validity.size()) return nullptr;
  if (out_len) *out_len = bb.validity_len[c];
  return bb.validity[c];
}

int64_t a1t_ipc_col_nulls(void* h, int32_t b, int32_t c) {
  auto* f = (IpcFile*)h;
  if (b < 0 || (size_t)b >= f->batches.size()) return -1;
  auto& bb = f->batches[b];
  if (c < 0 || (size_t)c >= bb.null_count.size()) return -1;
  return bb.null_count[c];
}

// var-binary offsets buffer (int32/int64 per type), NULL for fixed
const uint8_t* a1t_ipc_col_offsets(void* h, int32_t b, int32_t c,
                                   uint64_t* out_len) {
  auto* f = (IpcFile*)h;
  if (b < 0 || (size_t)b >= f->batches.size()) return nullptr;
  auto& bb = f->batches[b];
  if (c < 0 || (size_t)c >= bb.offsets.size()) return nullptr;
  if (out_len) *out_len = bb.offsets_len[c];
  return bb.offsets[c];
}

// 0 = not dictionary-encoded, else the index type code (data buffers
// hold indices; values come from a1t_ipc_dict_*)
int32_t a1t_ipc_col_dict_index_type(void* h, int32_t c) {
  auto* f = (IpcFile*)h;
  if (c < 0 || (size_t)c >= f->cols.size()) return 0;
  return f->cols[c].dict_id >= 0 ? f->cols[c].index_type : 0;
}

int64_t a1t_ipc_dict_rows(void* h, int32_t c) {
  auto* f = (IpcFile*)h;
  if (c < 0 || (size_t)c >= f->cols.size()) return -1;
  auto* d = f->dict_for(f->cols[c].dict_id);
  return d ? d->rows : -1;
}

const uint8_t* a1t_ipc_dict_data(void* h, int32_t c, uint64_t* out_len) {
  auto* f = (IpcFile*)h;
  if (c < 0 || (size_t)c >= f->cols.size()) return nullptr;
  auto* d = f->dict_for(f->cols[c].dict_id);
  if (!d) return nullptr;
  if (out_len) *out_len = d->data_len;
  return d->data;
}

const uint8_t* a1t_ipc_dict_offsets(void* h, int32_t c,
                                    uint64_t* out_len) {
  auto* f = (IpcFile*)h;
  if (c < 0 || (size_t)c >= f->cols.size()) return nullptr;
  auto* d = f->dict_for(f->cols[c].dict_id);
  if (!d) return nullptr;
  if (out_len) *out_len = d->offsets_len;
  return d->offsets;
}

const uint8_t* a1t_ipc_dict_validity(void* h, int32_t c,
                                     uint64_t* out_len) {
  auto* f = (IpcFile*)h;
  if (c < 0 || (size_t)c >= f->cols.size()) return nullptr;
  auto* d = f->dict_for(f->cols[c].dict_id);
  if (!d) return nullptr;
  if (out_len) *out_len = d->validity_len;
  return d->validity;
}

}  // extern "C"
