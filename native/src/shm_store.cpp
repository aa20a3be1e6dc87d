// Shared-memory object store (plasma analogue).
//
// Re-design of the reference's plasma store (reference:
// cpp/src/plasma/store.h:56, client.h:46 — a daemon + unix-socket + fd
// passing architecture). The daemon was plasma's main source of
// operational pain; this store is daemon-less: a POSIX shm segment
// containing an object table + bump arena, coordinated by a spinlock in
// the segment itself. Clients in any process map the same segment and
// get zero-copy object pointers (the role plasma's mmap+fd-passing
// played, reference: plasma/fling.cc).
//
// Layout: [Header | ObjectSlot x max_objects | arena bytes].
// Objects are identified by 20-byte ObjectIDs (plasma's ID width,
// reference: plasma/common.h ObjectID = UniqueID<20>).
//
// Concurrency: single spinlock (sufficient: operations are O(table) and
// the store fronts host-RAM staging, not a hot path). Eviction: LRU on
// sealed objects when the arena is full (reference:
// plasma/eviction_policy.h), implemented as free-list-less compaction
// skip — we simply evict (mark free) least-recently-used unpinned
// objects until the bump region tail has room; freed holes are reused
// only via whole-arena reset (fragmentation accepted for a staging
// store).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cerrno>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

namespace {

constexpr uint64_t kMagic = 0xA17A57032E000001ULL;
constexpr int kIdLen = 20;

struct ObjectSlot {
  uint8_t id[kIdLen];
  uint8_t used;        // 0 free, 1 created (unsealed), 2 sealed
  int32_t refcount;    // pins from gets
  uint64_t offset;     // into arena
  uint64_t size;
  uint64_t lru_tick;   // last touch
};

struct Header {
  uint64_t magic;
  uint64_t capacity;       // arena bytes
  uint64_t max_objects;
  std::atomic<uint64_t> bump;      // next free arena offset
  std::atomic<uint64_t> tick;      // LRU clock
  std::atomic<int> lock;           // spinlock
  uint64_t evictions;
};

struct Store {
  Header* hdr;
  ObjectSlot* slots;
  uint8_t* arena;
  size_t mapped;
  char name[256];
};

void lock(Header* h) {
  int expected = 0;
  while (!h->lock.compare_exchange_weak(expected, 1,
                                        std::memory_order_acquire)) {
    expected = 0;
#if defined(__x86_64__)
    __builtin_ia32_pause();
#endif
  }
}

void unlock(Header* h) { h->lock.store(0, std::memory_order_release); }

ObjectSlot* find(Store* s, const uint8_t* id) {
  for (uint64_t i = 0; i < s->hdr->max_objects; i++) {
    if (s->slots[i].used && !memcmp(s->slots[i].id, id, kIdLen))
      return &s->slots[i];
  }
  return nullptr;
}

ObjectSlot* free_slot(Store* s) {
  for (uint64_t i = 0; i < s->hdr->max_objects; i++)
    if (!s->slots[i].used) return &s->slots[i];
  return nullptr;
}

// Evict LRU sealed+unpinned objects. Space is only reclaimed when the
// evicted object abuts the bump tail; otherwise the slot frees but the
// hole remains (staging-store tradeoff, see file comment).
// 64-byte allocation granularity (Arrow buffer alignment contract).
inline uint64_t aligned_size(uint64_t size) {
  return (size + 63) & ~uint64_t(63);
}

bool try_evict(Store* s, uint64_t need) {
  bool any = true;
  while (any &&
         s->hdr->bump.load() + need > s->hdr->capacity) {
    any = false;
    ObjectSlot* victim = nullptr;
    for (uint64_t i = 0; i < s->hdr->max_objects; i++) {
      ObjectSlot& sl = s->slots[i];
      if (sl.used == 2 && sl.refcount == 0 &&
          (!victim || sl.lru_tick < victim->lru_tick))
        victim = &sl;
    }
    if (victim) {
      if (victim->offset + aligned_size(victim->size) == s->hdr->bump.load())
        s->hdr->bump.store(victim->offset);
      victim->used = 0;
      s->hdr->evictions++;
      any = true;
    }
  }
  return s->hdr->bump.load() + need <= s->hdr->capacity;
}

}  // namespace

extern "C" {

// Create (or overwrite) a store. Returns handle or null.
void* a1t_store_create(const char* name, uint64_t capacity,
                       uint64_t max_objects) {
  shm_unlink(name);
  int fd = shm_open(name, O_CREAT | O_RDWR | O_EXCL, 0600);
  if (fd < 0) return nullptr;
  size_t total = sizeof(Header) + max_objects * sizeof(ObjectSlot) + capacity;
  if (ftruncate(fd, (off_t)total) != 0) { close(fd); return nullptr; }
  void* mem = mmap(nullptr, total, PROT_READ | PROT_WRITE, MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return nullptr;
  Store* s = new Store();
  s->hdr = (Header*)mem;
  memset((void*)s->hdr, 0, sizeof(Header));
  s->hdr->magic = kMagic;
  s->hdr->capacity = capacity;
  s->hdr->max_objects = max_objects;
  s->slots = (ObjectSlot*)((uint8_t*)mem + sizeof(Header));
  memset((void*)s->slots, 0, max_objects * sizeof(ObjectSlot));
  s->arena = (uint8_t*)s->slots + max_objects * sizeof(ObjectSlot);
  s->mapped = total;
  snprintf(s->name, sizeof(s->name), "%s", name);
  return s;
}

void* a1t_store_open(const char* name) {
  int fd = shm_open(name, O_RDWR, 0600);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0) { close(fd); return nullptr; }
  void* mem = mmap(nullptr, (size_t)st.st_size, PROT_READ | PROT_WRITE,
                   MAP_SHARED, fd, 0);
  close(fd);
  if (mem == MAP_FAILED) return nullptr;
  Store* s = new Store();
  s->hdr = (Header*)mem;
  if (s->hdr->magic != kMagic) { munmap(mem, (size_t)st.st_size);
                                 delete s; return nullptr; }
  s->slots = (ObjectSlot*)((uint8_t*)mem + sizeof(Header));
  s->arena = (uint8_t*)s->slots + s->hdr->max_objects * sizeof(ObjectSlot);
  s->mapped = (size_t)st.st_size;
  snprintf(s->name, sizeof(s->name), "%s", name);
  return s;
}

// Create an object and return a writable pointer (two-phase create/seal,
// like plasma: reference plasma/client.h Create+Seal).
void* a1t_create(void* store, const uint8_t* id, uint64_t size) {
  Store* s = (Store*)store;
  lock(s->hdr);
  if (find(s, id)) { unlock(s->hdr); return nullptr; }  // exists
  ObjectSlot* slot = free_slot(s);
  if (!slot || !try_evict(s, aligned_size(size))) { unlock(s->hdr); return nullptr; }
  memcpy(slot->id, id, kIdLen);
  slot->used = 1;
  slot->refcount = 0;
  // aligned bump so zero-copy int64/float64 views are always aligned;
  // slot->size stays logical (plasma aligns allocations the same way)
  slot->offset = s->hdr->bump.fetch_add(aligned_size(size));
  slot->size = size;
  slot->lru_tick = s->hdr->tick.fetch_add(1);
  void* ptr = s->arena + slot->offset;
  unlock(s->hdr);
  return ptr;
}

int a1t_seal(void* store, const uint8_t* id) {
  Store* s = (Store*)store;
  lock(s->hdr);
  ObjectSlot* slot = find(s, id);
  int ok = (slot && slot->used == 1);
  if (ok) slot->used = 2;
  unlock(s->hdr);
  return ok ? 0 : -1;
}

// Get a sealed object: pins it (refcount++) and returns pointer+size.
const void* a1t_get(void* store, const uint8_t* id, uint64_t* size_out) {
  Store* s = (Store*)store;
  lock(s->hdr);
  ObjectSlot* slot = find(s, id);
  if (!slot || slot->used != 2) { unlock(s->hdr); return nullptr; }
  slot->refcount++;
  slot->lru_tick = s->hdr->tick.fetch_add(1);
  *size_out = slot->size;
  const void* ptr = s->arena + slot->offset;
  unlock(s->hdr);
  return ptr;
}

int a1t_release(void* store, const uint8_t* id) {
  Store* s = (Store*)store;
  lock(s->hdr);
  ObjectSlot* slot = find(s, id);
  int ok = (slot && slot->refcount > 0);
  if (ok) slot->refcount--;
  unlock(s->hdr);
  return ok ? 0 : -1;
}

int a1t_delete(void* store, const uint8_t* id) {
  Store* s = (Store*)store;
  lock(s->hdr);
  ObjectSlot* slot = find(s, id);
  int ok = (slot && slot->refcount == 0);
  if (ok) {
    if (slot->offset + aligned_size(slot->size) == s->hdr->bump.load())
      s->hdr->bump.store(slot->offset);
    slot->used = 0;
  }
  unlock(s->hdr);
  return ok ? 0 : -1;
}

int a1t_contains(void* store, const uint8_t* id) {
  Store* s = (Store*)store;
  lock(s->hdr);
  ObjectSlot* slot = find(s, id);
  int r = (slot && slot->used == 2) ? 1 : 0;
  unlock(s->hdr);
  return r;
}

uint64_t a1t_store_bytes_used(void* store) {
  return ((Store*)store)->hdr->bump.load();
}

uint64_t a1t_store_evictions(void* store) {
  return ((Store*)store)->hdr->evictions;
}

// List object ids: fills ids (n*20 bytes), returns count written.
uint64_t a1t_list(void* store, uint8_t* ids, uint64_t max_n) {
  Store* s = (Store*)store;
  lock(s->hdr);
  uint64_t n = 0;
  for (uint64_t i = 0; i < s->hdr->max_objects && n < max_n; i++) {
    if (s->slots[i].used == 2) {
      memcpy(ids + n * kIdLen, s->slots[i].id, kIdLen);
      n++;
    }
  }
  unlock(s->hdr);
  return n;
}

void a1t_store_close(void* store) {
  Store* s = (Store*)store;
  munmap((void*)s->hdr, s->mapped);
  delete s;
}

void a1t_store_destroy(const char* name) { shm_unlink(name); }

}  // extern "C"
