// Snappy block-format decompressor (for the native Parquet reader).
//
// Reference consumer: cpp/src/arrow/util/compression_snappy.cc (which
// wraps google/snappy). This is an original implementation of the
// snappy block format (format_description.txt): a varint uncompressed
// length followed by literal/copy tagged elements:
//   tag & 3 == 0: literal, length in tag>>2 (or 1-4 extra length bytes)
//   tag & 3 == 1: copy, 4..11 bytes, 11-bit offset (3 high tag bits +
//                 1 byte)
//   tag & 3 == 2: copy, 1..64 bytes, 16-bit LE offset
//   tag & 3 == 3: copy, 1..64 bytes, 32-bit LE offset
//
// C ABI: a1t_snappy_uncompressed_len + a1t_snappy_decompress.

#include <cstdint>
#include <cstring>

namespace {

// varint32 at p; returns bytes consumed (0 on error)
int read_varint(const uint8_t* p, const uint8_t* end, uint32_t* out) {
  uint32_t v = 0;
  int shift = 0;
  for (int i = 0; i < 5 && p + i < end; i++) {
    v |= (uint32_t)(p[i] & 0x7F) << shift;
    if (!(p[i] & 0x80)) {
      *out = v;
      return i + 1;
    }
    shift += 7;
  }
  return 0;
}

}  // namespace

extern "C" {

int64_t a1t_snappy_uncompressed_len(const uint8_t* src, int64_t n) {
  uint32_t len;
  int c = read_varint(src, src + n, &len);
  return c ? (int64_t)len : -1;
}

// Returns bytes written, or -1 on malformed input.
int64_t a1t_snappy_decompress(const uint8_t* src, int64_t n,
                              uint8_t* dst, int64_t cap) {
  const uint8_t* p = src;
  const uint8_t* end = src + n;
  uint32_t ulen;
  int c = read_varint(p, end, &ulen);
  if (!c || (int64_t)ulen > cap) return -1;
  p += c;
  uint8_t* out = dst;
  uint8_t* out_end = dst + ulen;
  while (p < end && out < out_end) {
    uint8_t tag = *p++;
    uint32_t kind = tag & 3;
    if (kind == 0) {  // literal
      uint32_t len = tag >> 2;
      if (len >= 60) {
        int extra = len - 59;  // 1..4 length bytes
        if (p + extra > end) return -1;
        len = 0;
        for (int i = 0; i < extra; i++) len |= (uint32_t)p[i] << (8 * i);
        p += extra;
      }
      len += 1;
      if (p + len > end || out + len > out_end) return -1;
      std::memcpy(out, p, len);
      p += len;
      out += len;
      continue;
    }
    uint32_t len, offset;
    if (kind == 1) {
      if (p >= end) return -1;
      len = 4 + ((tag >> 2) & 7);
      offset = ((uint32_t)(tag >> 5) << 8) | *p++;
    } else if (kind == 2) {
      if (p + 2 > end) return -1;
      len = 1 + (tag >> 2);
      offset = (uint32_t)p[0] | ((uint32_t)p[1] << 8);
      p += 2;
    } else {
      if (p + 4 > end) return -1;
      len = 1 + (tag >> 2);
      offset = (uint32_t)p[0] | ((uint32_t)p[1] << 8) |
               ((uint32_t)p[2] << 16) | ((uint32_t)p[3] << 24);
      p += 4;
    }
    if (offset == 0 || (int64_t)offset > out - dst ||
        out + len > out_end)
      return -1;
    // overlapping copies are the RLE mechanism: byte-by-byte when near
    const uint8_t* from = out - offset;
    if (offset >= len) {
      std::memcpy(out, from, len);
      out += len;
    } else {
      for (uint32_t i = 0; i < len; i++) *out++ = *from++;
    }
  }
  return out == out_end ? (int64_t)ulen : -1;
}

}  // extern "C"
