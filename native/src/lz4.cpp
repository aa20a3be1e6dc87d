// LZ4 block + frame codec (for Arrow IPC body-buffer compression).
//
// Reference consumer: cpp/src/arrow/util/compression_lz4.cc (which wraps
// lz4frame). This is an original implementation of the two public
// formats:
//   block (lz4_Block_format.md): sequences of
//     [token][litlen ext*][literals][offset u16le][matchlen ext*]
//     with a minimum match of 4 and the end-of-block literal-only rules.
//   frame (lz4_Frame_format.md): magic 0x184D2204, FLG/BD descriptor,
//     optional content size, XXH32 header checksum byte, data blocks
//     (u32le size, high bit = stored/uncompressed), EndMark, optional
//     content checksum.
//
// C ABI: a1t_lz4_block_{compress,decompress},
//        a1t_lz4_frame_{compress,decompress,max_compressed}.

#include <cstdint>
#include <cstring>

namespace {

// ---------------- XXH32 (xxhash spec) ----------------
const uint32_t P1 = 2654435761U, P2 = 2246822519U, P3 = 3266489917U,
               P4 = 668265263U, P5 = 374761393U;

inline uint32_t rotl(uint32_t x, int r) { return (x << r) | (x >> (32 - r)); }

inline uint32_t rd32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;  // little-endian hosts only (x86/arm LE)
}

uint32_t xxh32(const uint8_t* p, size_t len, uint32_t seed) {
  const uint8_t* end = p + len;
  uint32_t h;
  if (len >= 16) {
    uint32_t v1 = seed + P1 + P2, v2 = seed + P2, v3 = seed,
             v4 = seed - P1;
    const uint8_t* limit = end - 16;
    do {
      v1 = rotl(v1 + rd32(p) * P2, 13) * P1; p += 4;
      v2 = rotl(v2 + rd32(p) * P2, 13) * P1; p += 4;
      v3 = rotl(v3 + rd32(p) * P2, 13) * P1; p += 4;
      v4 = rotl(v4 + rd32(p) * P2, 13) * P1; p += 4;
    } while (p <= limit);
    h = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18);
  } else {
    h = seed + P5;
  }
  h += (uint32_t)len;
  while (p + 4 <= end) {
    h = rotl(h + rd32(p) * P3, 17) * P4;
    p += 4;
  }
  while (p < end) {
    h = rotl(h + (*p++) * P5, 11) * P1;
  }
  h ^= h >> 15; h *= P2; h ^= h >> 13; h *= P3; h ^= h >> 16;
  return h;
}

// ---------------- LZ4 block ----------------

// `hist` = decoded bytes already present immediately before dst
// (linked-block frames let matches reach into prior blocks' output).
int64_t block_decompress(const uint8_t* src, int64_t n, uint8_t* dst,
                         int64_t cap, int64_t hist = 0) {
  const uint8_t* p = src;
  const uint8_t* end = src + n;
  uint8_t* out = dst;
  uint8_t* out_end = dst + cap;
  while (p < end) {
    uint8_t token = *p++;
    // literals
    uint32_t lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (p >= end) return -1;
        b = *p++;
        lit += b;
      } while (b == 255);
    }
    if (p + lit > end || out + lit > out_end) return -1;
    std::memcpy(out, p, lit);
    p += lit;
    out += lit;
    if (p >= end) break;  // last sequence is literals-only
    // match
    if (p + 2 > end) return -1;
    uint32_t offset = (uint32_t)p[0] | ((uint32_t)p[1] << 8);
    p += 2;
    if (offset == 0 || (out - dst) + hist < (int64_t)offset) return -1;
    uint32_t mlen = (token & 0xF);
    if (mlen == 15) {
      uint8_t b;
      do {
        if (p >= end) return -1;
        b = *p++;
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (out + mlen > out_end) return -1;
    const uint8_t* m = out - offset;
    // overlapping copy must run forward byte-wise
    for (uint32_t i = 0; i < mlen; i++) out[i] = m[i];
    out += mlen;
  }
  return out - dst;
}

// greedy hash-table compressor (the reference "fast" strategy shape)
const int HASH_LOG = 16;
inline uint32_t hash4(uint32_t v) {
  return (v * 2654435761U) >> (32 - HASH_LOG);
}

void put_length(uint8_t*& op, uint32_t len) {
  while (len >= 255) { *op++ = 255; len -= 255; }
  *op++ = (uint8_t)len;
}

int64_t block_compress(const uint8_t* src, int64_t n, uint8_t* dst,
                       int64_t cap) {
  // worst case: n + n/255 + 16
  uint8_t* op = dst;
  uint8_t* op_end = dst + cap;
  const uint8_t* ip = src;
  const uint8_t* anchor = src;
  const uint8_t* end = src + n;
  // spec: last 5 bytes are always literals; matches must not start
  // within the last 12 bytes
  const uint8_t* match_limit = end - 12;

  static thread_local int32_t table[1 << HASH_LOG];
  for (int i = 0; i < (1 << HASH_LOG); i++) table[i] = -1;

  if (n >= 13) {
    while (ip < match_limit) {
      uint32_t h = hash4(rd32(ip));
      int32_t cand = table[h];
      table[h] = (int32_t)(ip - src);
      if (cand >= 0 && (ip - src) - cand <= 65535 &&
          rd32(src + cand) == rd32(ip)) {
        // extend match forward
        const uint8_t* m = src + cand;
        const uint8_t* mi = ip + 4;
        const uint8_t* mm = m + 4;
        const uint8_t* safe_end = end - 5;
        while (mi < safe_end && *mi == *mm) { mi++; mm++; }
        uint32_t mlen = (uint32_t)(mi - ip) - 4;
        uint32_t lit = (uint32_t)(ip - anchor);
        // emit sequence
        if (op + 1 + lit + lit / 255 + 2 + mlen / 255 + 16 > op_end)
          return -1;
        uint8_t* tok = op++;
        if (lit >= 15) { *tok = 0xF0; put_length(op, lit - 15); }
        else *tok = (uint8_t)(lit << 4);
        std::memcpy(op, anchor, lit);
        op += lit;
        uint32_t offset = (uint32_t)(ip - m);
        *op++ = (uint8_t)offset;
        *op++ = (uint8_t)(offset >> 8);
        if (mlen >= 15) { *tok |= 0x0F; put_length(op, mlen - 15); }
        else *tok |= (uint8_t)mlen;
        ip = mi;
        anchor = ip;
      } else {
        ip++;
      }
    }
  }
  // trailing literals
  uint32_t lit = (uint32_t)(end - anchor);
  if (op + 1 + lit + lit / 255 + 8 > op_end) return -1;
  uint8_t* tok = op++;
  if (lit >= 15) { *tok = 0xF0; put_length(op, lit - 15); }
  else *tok = (uint8_t)(lit << 4);
  std::memcpy(op, anchor, lit);
  op += lit;
  return op - dst;
}

}  // namespace

extern "C" {

int64_t a1t_lz4_block_decompress(const uint8_t* src, int64_t n,
                                 uint8_t* dst, int64_t cap) {
  return block_decompress(src, n, dst, cap);
}

int64_t a1t_lz4_block_compress(const uint8_t* src, int64_t n,
                               uint8_t* dst, int64_t cap) {
  return block_compress(src, n, dst, cap);
}

int64_t a1t_lz4_frame_max_compressed(int64_t n) {
  int64_t blocks = n / (4 << 20) + 1;
  return n + n / 255 + blocks * 24 + 32;
}

// Frame: magic, FLG(version=01, b.indep=1, c.size=1), BD(4MB), HC,
// blocks, EndMark. Returns bytes written or -1.
int64_t a1t_lz4_frame_compress(const uint8_t* src, int64_t n,
                               uint8_t* dst, int64_t cap) {
  uint8_t* op = dst;
  uint8_t* op_end = dst + cap;
  if (op + 19 > op_end) return -1;
  const uint32_t MAGIC = 0x184D2204U;
  std::memcpy(op, &MAGIC, 4);
  op += 4;
  uint8_t* desc = op;
  *op++ = 0x68;  // FLG: version 01, block-indep 1, content-size 1
  *op++ = 0x70;  // BD: block max 4 MB
  uint64_t csize = (uint64_t)n;
  std::memcpy(op, &csize, 8);
  op += 8;
  *op++ = (uint8_t)(xxh32(desc, 10, 0) >> 8);  // header checksum
  const int64_t BLOCK = 4 << 20;
  for (int64_t off = 0; off < n; off += BLOCK) {
    int64_t len = n - off < BLOCK ? n - off : BLOCK;
    if (op + 4 + len + len / 255 + 16 > op_end) return -1;
    int64_t c = block_compress(src + off, len, op + 4, len - 1);
    uint32_t hdr;
    if (c < 0 || c >= len) {  // incompressible: stored block
      hdr = (uint32_t)len | 0x80000000U;
      std::memcpy(op, &hdr, 4);
      std::memcpy(op + 4, src + off, len);
      op += 4 + len;
    } else {
      hdr = (uint32_t)c;
      std::memcpy(op, &hdr, 4);
      op += 4 + c;
    }
  }
  if (op + 4 > op_end) return -1;
  std::memset(op, 0, 4);  // EndMark
  op += 4;
  return op - dst;
}

// Returns bytes written or -1 on malformed input.
int64_t a1t_lz4_frame_decompress(const uint8_t* src, int64_t n,
                                 uint8_t* dst, int64_t cap) {
  const uint8_t* p = src;
  const uint8_t* end = src + n;
  if (p + 7 > end) return -1;
  uint32_t magic;
  std::memcpy(&magic, p, 4);
  if (magic != 0x184D2204U) return -1;
  p += 4;
  uint8_t flg = *p++;
  uint8_t bd = *p++;
  (void)bd;
  if ((flg >> 6) != 1) return -1;              // version
  bool b_checksum = flg & 0x10;
  bool c_size = flg & 0x08;
  bool c_checksum = flg & 0x04;
  bool dict_id = flg & 0x01;
  if (c_size) p += 8;
  if (dict_id) p += 4;
  p += 1;  // header checksum byte
  if (p > end) return -1;
  uint8_t* out = dst;
  while (true) {
    if (p + 4 > end) return -1;
    uint32_t hdr;
    std::memcpy(&hdr, p, 4);
    p += 4;
    if (hdr == 0) break;  // EndMark
    bool stored = hdr & 0x80000000U;
    uint32_t len = hdr & 0x7FFFFFFFU;
    if (p + len > end) return -1;
    if (stored) {
      if (out + len > dst + cap) return -1;
      std::memcpy(out, p, len);
      out += len;
    } else {
      int64_t w = block_decompress(p, len, out, cap - (out - dst),
                                   out - dst);
      if (w < 0) return -1;
      out += w;
    }
    p += len;
    if (b_checksum) p += 4;
  }
  (void)c_checksum;
  return out - dst;
}

}  // extern "C"
