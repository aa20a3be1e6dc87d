// Pure-C++ consumer of Arrow IPC files via libarrow1_tpu_native —
// no Python on the path. Build: cmake --build native/build --target
// a1t_read_ipc; run: a1t_read_ipc file.arrow
//
// Demonstrates the second-language binding surface: schema walk,
// per-batch zero-copy column access, null counts.

#include <cinttypes>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
void* a1t_ipc_open(const uint8_t* data, uint64_t len);
int32_t a1t_ipc_err(void* h);
void a1t_ipc_close(void* h);
int32_t a1t_ipc_ncols(void* h);
int32_t a1t_ipc_nbatches(void* h);
const char* a1t_ipc_col_name(void* h, int32_t i);
int32_t a1t_ipc_col_type(void* h, int32_t i);
int64_t a1t_ipc_batch_rows(void* h, int32_t b);
const uint8_t* a1t_ipc_col_data(void* h, int32_t b, int32_t c,
                                uint64_t* out_len);
const uint8_t* a1t_ipc_col_validity(void* h, int32_t b, int32_t c,
                                    uint64_t* out_len);
int64_t a1t_ipc_col_nulls(void* h, int32_t b, int32_t c);
const uint8_t* a1t_ipc_col_offsets(void* h, int32_t b, int32_t c,
                                   uint64_t* out_len);
int32_t a1t_ipc_col_dict_index_type(void* h, int32_t c);
int64_t a1t_ipc_dict_rows(void* h, int32_t c);
const uint8_t* a1t_ipc_dict_data(void* h, int32_t c, uint64_t* out_len);
const uint8_t* a1t_ipc_dict_offsets(void* h, int32_t c,
                                    uint64_t* out_len);
}

static const char* kTypeNames[] = {
    "unsupported", "int8",   "int16",  "int32",   "int64",   "uint8",
    "uint16",      "uint32", "uint64", "float32", "float64", "bool",
    "utf8",        "binary", "large_utf8", "large_binary"};

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <file.arrow>\n", argv[0]);
    return 2;
  }
  FILE* f = std::fopen(argv[1], "rb");
  if (!f) {
    std::perror("open");
    return 1;
  }
  std::fseek(f, 0, SEEK_END);
  long len = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf((size_t)len);
  if (std::fread(buf.data(), 1, (size_t)len, f) != (size_t)len) {
    std::fclose(f);
    return 1;
  }
  std::fclose(f);

  void* h = a1t_ipc_open(buf.data(), buf.size());
  if (!h || a1t_ipc_err(h)) {
    std::fprintf(stderr, "parse error %d\n", h ? a1t_ipc_err(h) : -1);
    if (h) a1t_ipc_close(h);
    return 1;
  }
  int32_t ncols = a1t_ipc_ncols(h);
  int32_t nb = a1t_ipc_nbatches(h);
  std::printf("columns=%d batches=%d\n", ncols, nb);
  for (int32_t c = 0; c < ncols; c++) {
    int32_t it = a1t_ipc_col_dict_index_type(h, c);
    if (it) {
      std::printf("  %s: dictionary<%s, indices=%s> (%" PRId64
                  " values)\n",
                  a1t_ipc_col_name(h, c),
                  kTypeNames[a1t_ipc_col_type(h, c)], kTypeNames[it],
                  a1t_ipc_dict_rows(h, c));
      // show the first dictionary value (utf8 path)
      uint64_t on = 0, dn = 0;
      const uint8_t* offs = a1t_ipc_dict_offsets(h, c, &on);
      const uint8_t* data = a1t_ipc_dict_data(h, c, &dn);
      if (offs && a1t_ipc_dict_rows(h, c) > 0) {
        int32_t o0, o1;
        std::memcpy(&o0, offs, 4);
        std::memcpy(&o1, offs + 4, 4);
        std::printf("    values[0] = \"%.*s\"\n", (int)(o1 - o0),
                    (const char*)data + o0);
      }
    } else {
      std::printf("  %s: %s\n", a1t_ipc_col_name(h, c),
                  kTypeNames[a1t_ipc_col_type(h, c)]);
    }
  }
  for (int32_t b = 0; b < nb; b++) {
    int64_t rows = a1t_ipc_batch_rows(h, b);
    std::printf("batch %d: %" PRId64 " rows\n", b, rows);
    for (int32_t c = 0; c < ncols; c++) {
      uint64_t n = 0;
      const uint8_t* data = a1t_ipc_col_data(h, b, c, &n);
      // checksum so the data path is demonstrably touched
      uint64_t sum = 0;
      for (uint64_t i = 0; i < n; i++) sum = sum * 131 + data[i];
      std::printf("  col %d: %" PRIu64 " bytes, nulls=%" PRId64
                  ", fnv=%016" PRIx64 "\n",
                  c, n, a1t_ipc_col_nulls(h, b, c), sum);
    }
  }
  a1t_ipc_close(h);
  return 0;
}
