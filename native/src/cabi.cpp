// Arrow C data interface release callbacks (reference: c/helpers.h
// ArrowArrayRelease contract).
//
// The producer side (arrow1_tpu/cabi.py) keeps exported buffers alive
// in a Python registry keyed by an export id stored in private_data.
// Release must be callable from ANY thread at ANY time — including
// after Python/ctypes teardown — so it lives here in C: it marks the
// struct released (release = NULL per spec) and records the export id
// on a drain list the Python side empties on its next export call.

#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct ArrowSchemaC {
  const char* format;
  const char* name;
  const char* metadata;
  int64_t flags;
  int64_t n_children;
  struct ArrowSchemaC** children;
  struct ArrowSchemaC* dictionary;
  void (*release)(struct ArrowSchemaC*);
  void* private_data;
};

struct ArrowArrayC {
  int64_t length;
  int64_t null_count;
  int64_t offset;
  int64_t n_buffers;
  int64_t n_children;
  const void** buffers;
  struct ArrowArrayC** children;
  struct ArrowArrayC* dictionary;
  void (*release)(struct ArrowArrayC*);
  void* private_data;
};

std::mutex g_mu;
std::vector<int64_t> g_released;

void record(void* private_data) {
  std::lock_guard<std::mutex> lk(g_mu);
  g_released.push_back((int64_t)(intptr_t)private_data);
}

}  // namespace

extern "C" {

void a1t_cabi_release_schema(ArrowSchemaC* s) {
  if (!s || !s->release) return;
  record(s->private_data);
  s->release = nullptr;
}

void a1t_cabi_release_array(ArrowArrayC* a) {
  if (!a || !a->release) return;
  record(a->private_data);
  a->release = nullptr;
}

// Pop up to cap released export ids into out; returns the count.
// ---------------------------------------------------------------------
// A real non-Python CONSUMER of the C data interface: walks the structs
// by the spec alone (format strings, validity bitmaps, offset handling)
// and returns checksums the producer can verify. Exercises the ABI the
// way an external C++/R/Java binding would (reference: c/bridge.cc
// ImportArray consumers).
// ---------------------------------------------------------------------

static inline bool bit(const uint8_t* bm, int64_t i) {
  return bm == nullptr || (bm[i >> 3] >> (i & 7)) & 1;
}

// Consume an int64/int32/float64/utf8 array via the ABI. Writes:
//   out[0] = valid count
//   out[1] = for ints: sum of valid values; f64: sum bit-pattern;
//            utf8: total byte length of valid strings
// Returns 0 ok, -1 unsupported format, -2 malformed.
int64_t a1t_cabi_consume(const ArrowSchemaC* schema,
                         const ArrowArrayC* arr, int64_t* out) {
  if (schema == nullptr || arr == nullptr || schema->format == nullptr)
    return -2;
  const char* f = schema->format;
  const int64_t n = arr->length;
  const int64_t off = arr->offset;
  const uint8_t* validity =
      arr->n_buffers > 0 ? (const uint8_t*)arr->buffers[0] : nullptr;
  int64_t valid = 0;
  if (f[0] == 'l' && f[1] == 0) {  // int64
    const int64_t* data = (const int64_t*)arr->buffers[1];
    int64_t sum = 0;
    for (int64_t i = 0; i < n; i++) {
      if (bit(validity, off + i)) { valid++; sum += data[off + i]; }
    }
    out[0] = valid; out[1] = sum;
    return 0;
  }
  if (f[0] == 'i' && f[1] == 0) {  // int32
    const int32_t* data = (const int32_t*)arr->buffers[1];
    int64_t sum = 0;
    for (int64_t i = 0; i < n; i++) {
      if (bit(validity, off + i)) { valid++; sum += data[off + i]; }
    }
    out[0] = valid; out[1] = sum;
    return 0;
  }
  if (f[0] == 'g' && f[1] == 0) {  // float64
    const double* data = (const double*)arr->buffers[1];
    double sum = 0;
    for (int64_t i = 0; i < n; i++) {
      if (bit(validity, off + i)) { valid++; sum += data[off + i]; }
    }
    out[0] = valid;
    std::memcpy(&out[1], &sum, 8);
    return 0;
  }
  if (f[0] == 'u' && f[1] == 0) {  // utf8
    const int32_t* offs = (const int32_t*)arr->buffers[1];
    int64_t bytes = 0;
    for (int64_t i = 0; i < n; i++) {
      if (bit(validity, off + i)) {
        valid++;
        bytes += offs[off + i + 1] - offs[off + i];
      }
    }
    out[0] = valid; out[1] = bytes;
    return 0;
  }
  return -1;
}

int64_t a1t_cabi_drain(int64_t* out, int64_t cap) {
  std::lock_guard<std::mutex> lk(g_mu);
  int64_t n = 0;
  while (n < cap && !g_released.empty()) {
    out[n++] = g_released.back();
    g_released.pop_back();
  }
  return n;
}

}  // extern "C"
