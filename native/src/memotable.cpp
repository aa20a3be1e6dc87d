// Hash + memo-table host library.
//
// Re-design of the reference's hashing infrastructure (reference:
// cpp/src/arrow/util/hashing.h — HashTable :198: linear-probing
// open-addressing with stored hashes, load factor < 0.75,
// grow-by-doubling :239-370; BinaryMemoTable :605: bytes -> dense int id
// in insertion order). Used by the Python engine for host-side
// dictionary building/unification where a Python dict would be the
// bottleneck (ingest of high-cardinality string columns).
//
// The hash is our own mix (splitmix64-style avalanche over 8-byte
// words) — same role as the reference's multiply-shift + xxhash
// combination (hashing.h:84-190), independently implemented.

#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline uint64_t mix64(uint64_t x) {
  x += 0x9E3779B97F4A7C15ULL;
  x = (x ^ (x >> 30)) * 0xBF58476D1CE4E5B9ULL;
  x = (x ^ (x >> 27)) * 0x94D049BB133111EBULL;
  return x ^ (x >> 31);
}

uint64_t hash_bytes(const uint8_t* data, uint64_t len) {
  uint64_t h = 0x2545F4914F6CDD1DULL ^ (len * 0x9E3779B97F4A7C15ULL);
  while (len >= 8) {
    uint64_t w;
    memcpy(&w, data, 8);
    h = mix64(h ^ w);
    data += 8;
    len -= 8;
  }
  uint64_t tail = 0;
  if (len) memcpy(&tail, data, len);
  return mix64(h ^ tail);
}

struct Entry {
  uint64_t hash;
  int32_t id;      // -1 = empty
};

// Open-addressing linear-probe memo table over an append-only byte pool.
struct MemoTable {
  std::vector<Entry> table;
  std::vector<uint8_t> pool;         // concatenated values
  std::vector<uint64_t> offsets;     // offsets[id]..offsets[id+1]
  uint64_t mask;

  MemoTable(uint64_t initial) {
    uint64_t cap = 64;
    while (cap < initial * 2) cap <<= 1;
    table.assign(cap, Entry{0, -1});
    mask = cap - 1;
    offsets.push_back(0);
  }

  int32_t size() const { return (int32_t)offsets.size() - 1; }

  const uint8_t* value(int32_t id, uint64_t* len) const {
    *len = offsets[id + 1] - offsets[id];
    return pool.data() + offsets[id];
  }

  bool equals(int32_t id, const uint8_t* data, uint64_t len) const {
    uint64_t vl;
    const uint8_t* v = value(id, &vl);
    return vl == len && (len == 0 || !memcmp(v, data, len));
  }

  void grow() {  // doubling rehash (reference: hashing.h:239 upsize)
    std::vector<Entry> old;
    old.swap(table);
    table.assign(old.size() * 2, Entry{0, -1});
    mask = table.size() - 1;
    for (const Entry& e : old) {
      if (e.id < 0) continue;
      uint64_t slot = e.hash & mask;
      while (table[slot].id >= 0) slot = (slot + 1) & mask;
      table[slot] = e;
    }
  }

  int32_t get_or_insert(const uint8_t* data, uint64_t len) {
    uint64_t h = hash_bytes(data, len);
    uint64_t slot = h & mask;
    while (true) {
      Entry& e = table[slot];
      if (e.id < 0) {
        int32_t id = size();
        pool.insert(pool.end(), data, data + len);
        offsets.push_back(pool.size());
        e.hash = h;
        e.id = id;
        // load factor < 0.75 (reference: hashing.h kLoadFactor)
        if ((uint64_t)(size() + 1) * 4 > table.size() * 3) grow();
        return id;
      }
      if (e.hash == h && equals(e.id, data, len)) return e.id;
      slot = (slot + 1) & mask;
    }
  }

  int32_t lookup(const uint8_t* data, uint64_t len) const {
    uint64_t h = hash_bytes(data, len);
    uint64_t slot = h & mask;
    while (true) {
      const Entry& e = table[slot];
      if (e.id < 0) return -1;
      if (e.hash == h && equals(e.id, data, len)) return e.id;
      slot = (slot + 1) & mask;
    }
  }
};

}  // namespace

extern "C" {

uint64_t a1t_hash_bytes(const uint8_t* data, uint64_t len) {
  return hash_bytes(data, len);
}

// Vectorized hashing of var-binary arrays given (offsets int64[n+1],
// data bytes): the bulk entry the Python layer feeds arrow buffers into.
void a1t_hash_binary_array(const uint8_t* data, const int64_t* offsets,
                           int64_t n, uint64_t* out) {
  for (int64_t i = 0; i < n; i++) {
    out[i] = hash_bytes(data + offsets[i],
                        (uint64_t)(offsets[i + 1] - offsets[i]));
  }
}

void* a1t_memo_create(uint64_t initial_capacity) {
  return new MemoTable(initial_capacity ? initial_capacity : 64);
}

void a1t_memo_destroy(void* m) { delete (MemoTable*)m; }

int32_t a1t_memo_size(void* m) { return ((MemoTable*)m)->size(); }

int32_t a1t_memo_get_or_insert(void* m, const uint8_t* data, uint64_t len) {
  return ((MemoTable*)m)->get_or_insert(data, len);
}

int32_t a1t_memo_lookup(void* m, const uint8_t* data, uint64_t len) {
  return ((MemoTable*)m)->lookup(data, len);
}

// Bulk encode a var-binary array -> dense ids (dictionary-encode core).
void a1t_memo_encode_array(void* m, const uint8_t* data,
                           const int64_t* offsets, int64_t n,
                           int32_t* ids_out) {
  MemoTable* t = (MemoTable*)m;
  for (int64_t i = 0; i < n; i++) {
    ids_out[i] = t->get_or_insert(
        data + offsets[i], (uint64_t)(offsets[i + 1] - offsets[i]));
  }
}

// Export the pool: copies offsets (int64[n+1]); returns pool pointer
// valid until the table is destroyed or grown by further inserts.
const uint8_t* a1t_memo_values(void* m, int64_t* offsets_out) {
  MemoTable* t = (MemoTable*)m;
  for (size_t i = 0; i < t->offsets.size(); i++)
    offsets_out[i] = (int64_t)t->offsets[i];
  return t->pool.data();
}

}  // extern "C"
