// Pure-C++ producer of Arrow IPC files via libarrow1_tpu_native —
// no Python on the path. Build: cmake --build native/build --target
// a1t_write_ipc; run: a1t_write_ipc out.arrow
//
// Demonstrates the second-language binding surface end-to-end with
// examples/read_ipc.cc: declare a schema, hand over raw column
// buffers (+ an LSB-packed validity bitmap), serialize the file
// format. The output is readable by pyarrow, arrow1_tpu's Python
// reader, and a1t_read_ipc.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <vector>

extern "C" {
void* a1t_ipcw_new();
void a1t_ipcw_close(void* h);
int32_t a1t_ipcw_err(void* h);
int32_t a1t_ipcw_add_col(void* h, const char* name, int32_t type_code,
                         int32_t nullable);
int32_t a1t_ipcw_add_batch(void* h, int64_t rows, const uint8_t** data,
                           const uint8_t** validity,
                           const int64_t* null_count);
uint8_t* a1t_ipcw_finish(void* h, int32_t stream_mode, uint64_t* out_len);
void a1t_ipcw_free_buf(uint8_t* p);
}

enum { T_I64 = 4, T_F64 = 10, T_BOOL = 11 };

int main(int argc, char** argv) {
  if (argc != 2) {
    std::fprintf(stderr, "usage: %s <out.arrow>\n", argv[0]);
    return 2;
  }
  const int64_t rows = 10;
  std::vector<int64_t> ids(rows);
  std::vector<double> vals(rows);
  for (int64_t i = 0; i < rows; i++) {
    ids[i] = i * 7;
    vals[i] = 0.5 * (double)i;
  }
  // bool column + validity, both LSB-packed: rows 0..9, flag = i%2,
  // odd rows null on the value column
  uint8_t flags[2] = {0b10101010, 0b10};
  uint8_t valid_odd_null[2] = {0b01010101, 0b01};

  void* w = a1t_ipcw_new();
  a1t_ipcw_add_col(w, "id", T_I64, 0);
  a1t_ipcw_add_col(w, "val", T_F64, 1);
  a1t_ipcw_add_col(w, "flag", T_BOOL, 0);
  const uint8_t* data[3] = {(const uint8_t*)ids.data(),
                            (const uint8_t*)vals.data(), flags};
  const uint8_t* validity[3] = {nullptr, valid_odd_null, nullptr};
  const int64_t nulls[3] = {0, 5, 0};
  if (a1t_ipcw_add_batch(w, rows, data, validity, nulls) < 0) {
    std::fprintf(stderr, "add_batch failed: %d\n", a1t_ipcw_err(w));
    a1t_ipcw_close(w);
    return 1;
  }
  uint64_t len = 0;
  uint8_t* buf = a1t_ipcw_finish(w, 0, &len);
  if (!buf) {
    std::fprintf(stderr, "finish failed: %d\n", a1t_ipcw_err(w));
    a1t_ipcw_close(w);
    return 1;
  }
  FILE* f = std::fopen(argv[1], "wb");
  if (!f || std::fwrite(buf, 1, len, f) != len) {
    std::perror("write");
    return 1;
  }
  std::fclose(f);
  a1t_ipcw_free_buf(buf);
  a1t_ipcw_close(w);
  std::printf("wrote %llu bytes: 3 cols x %lld rows\n",
              (unsigned long long)len, (long long)rows);
  return 0;
}
