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
