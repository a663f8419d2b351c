// trico-tpu native host runtime: scalar FCM/DFCM floating-point stream codec and
// an LZ4-block-format codec, both implemented from scratch.
//
// Format compatibility targets (see SURVEY.md §2 and the format notes in
// trico_tpu/codec/fp_ref.py):
//  * FP substream: [u8 hash_info][u32 BE count] + tagged groups with big-endian
//    truncated XOR residuals (reference floating_point_stream_compression.c).
//  * LZ4: raw block format (token = 4b literal-run | 4b match-len, u16 LE offset,
//    MINMATCH 4, last-5-literals / 12-byte-end rules) — interoperable with any
//    compliant LZ4 block decoder/encoder.
//
// This is the fast host path of the framework (used by the archive layer for
// single-stream reference-compatible mode); the TPU path lives in
// trico_tpu/codec/fp_jax.py.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <thread>
#include <vector>

#define EXPORT extern "C" __attribute__((visibility("default")))

namespace {

// Run f(c) for c in [0, C) across hardware threads (chunks are uniform,
// disjoint-output work items; static partition keeps it deterministic).
template <class F>
void par_chunks(int64_t C, F&& f) {
  unsigned T = std::thread::hardware_concurrency();
  if (T > 16) T = 16;
  if (T < 2 || C < 8) {
    for (int64_t c = 0; c < C; ++c) f(c);
    return;
  }
  std::vector<std::thread> th;
  th.reserve(T);
  int64_t per = (C + T - 1) / T;
  for (unsigned t = 0; t < T; ++t) {
    int64_t lo = int64_t(t) * per, hi = lo + per < C ? lo + per : C;
    if (lo >= hi) break;
    th.emplace_back([f, lo, hi] {
      for (int64_t c = lo; c < hi; ++c) f(c);
    });
  }
  for (auto& x : th) x.join();
}

inline uint32_t load32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}

template <typename T>
struct HashTables {
  std::vector<T> t1, t2;
};

template <typename T, int BITS>
struct FpCtx {
  static constexpr int GROUP = (BITS == 32) ? 8 : 2;
  static constexpr int FCM_MAX = (BITS == 32) ? 4 : 8;
  uint32_t e1, e2;
  T m1, m2;
  std::vector<T> t1, t2;
  T h1 = 0, h2 = 0, pred1 = 0, pred2 = 0, last = 0;

  FpCtx(uint32_t e1_, uint32_t e2_) {
    e1 = (e1_ >> 1) << 1;
    e2 = (e2_ >> 1) << 1;
    if (e1 > 30) e1 = 30;
    if (e2 > 30) e2 = 30;
    m1 = (T(1) << e1) - 1;
    m2 = (T(1) << e2) - 1;
    t1.assign(size_t(1) << e1, 0);
    t2.assign(size_t(1) << e2, 0);
  }

  inline void step_tables(T v) {
    t1[h1] = v;
    h1 = e1 ? (((h1 << e1) ^ (v >> (BITS - e1))) & m1) : 0;
    pred1 = t1[h1];
    T stride = v - last;
    t2[h2] = stride;
    h2 = e2 ? (((h2 << (e2 / 2)) ^ (stride >> (BITS - e2))) & m2) : 0;
    // store DFCM prediction with last_value folded in (decoder form)
    pred2 = v + t2[h2];
    last = v;
  }
};

inline int byte_len32(uint32_t x) {
  if (!x) return 0;
  if (!(x >> 8)) return 1;
  if (!(x >> 16)) return 2;
  if (!(x >> 24)) return 3;
  return 4;
}
inline int byte_len64(uint64_t x) {
  int n = 0;
  while (x) {
    ++n;
    x >>= 8;
  }
  return n;
}

inline void put_be(uint8_t*& out, uint64_t v, int nbytes) {
  for (int q = nbytes - 1; q >= 0; --q) *out++ = uint8_t(v >> (8 * q));
}

}  // namespace

// ---------------------------------------------------------------- FP encode

template <typename T, int BITS>
static int64_t fp_encode(const T* in, uint32_t n, uint32_t e1, uint32_t e2,
                         uint8_t* out, int64_t cap) {
  constexpr int GROUP = (BITS == 32) ? 8 : 2;
  constexpr int FCM_MAX = (BITS == 32) ? 4 : 8;
  FpCtx<T, BITS> c(e1, e2);
  // worst case per group: tag + GROUP * sizeof(T)
  int64_t need = 5 + int64_t((n + GROUP - 1) / GROUP) * ((BITS == 32) ? 3 : 1) +
                 int64_t(n) * sizeof(T) + 8;
  if (cap < need) return -1;
  uint8_t* p = out;
  *p++ = uint8_t(((c.e1 >> 1) << 4) | (c.e2 >> 1));
  put_be(p, n, 4);
  if (n == 0) return p - out;

  T xor1[GROUP], xor2[GROUP];
  int bcode[GROUP];
  uint32_t j = 0;

  auto emit = [&](void) {
    if (BITS == 32) {
      uint32_t bc = 0;
      for (int k = 0; k < GROUP; ++k) bc |= uint32_t(bcode[k]) << (3 * k);
      *p++ = uint8_t(bc >> 16);
      *p++ = uint8_t(bc >> 8);
      *p++ = uint8_t(bc);
    } else {
      *p++ = uint8_t(bcode[0] | (bcode[1] << 4));
    }
    for (int k = 0; k < GROUP; ++k) {
      int b = bcode[k];
      if (!b) continue;
      if (b <= FCM_MAX)
        put_be(p, xor1[k], b);
      else
        put_be(p, xor2[k], b - FCM_MAX);
    }
  };

  for (uint32_t i = 0; i < n; ++i) {
    j = i % GROUP;
    T v = in[i];
    xor1[j] = v ^ c.pred1;
    xor2[j] = v ^ c.pred2;  // pred2 already includes last_value
    c.step_tables(v);
    int nb1 = (BITS == 32) ? byte_len32(uint32_t(xor1[j])) : byte_len64(xor1[j]);
    int nb2 = (BITS == 32) ? byte_len32(uint32_t(xor2[j])) : byte_len64(xor2[j]);
    if (nb2 == 0) nb2 = 1;  // DFCM zero residual still stores one byte
    if (nb1 >= 2 && nb2 < nb1 && nb2 <= FCM_MAX - 1)
      bcode[j] = FCM_MAX + nb2;
    else
      bcode[j] = nb1;
    if (j == GROUP - 1) emit();
  }
  if (j != GROUP - 1) {
    for (uint32_t k = j + 1; k < GROUP; ++k) {
      bcode[k] = 1;
      xor1[k] = 0;
    }
    emit();
  }
  return p - out;
}

// ---------------------------------------------------------------- FP decode

template <typename T, int BITS>
static int64_t fp_decode(const uint8_t* in, int64_t in_size, T* out,
                         uint32_t out_cap_n, uint32_t* n_out) {
  constexpr int GROUP = (BITS == 32) ? 8 : 2;
  constexpr int FCM_MAX = (BITS == 32) ? 4 : 8;
  if (in_size < 5) return -1;
  const uint8_t* p = in;
  const uint8_t* end = in + in_size;
  uint8_t hash_info = *p++;
  uint32_t e1 = uint32_t(hash_info >> 4) << 1;
  uint32_t e2 = uint32_t(hash_info & 15) << 1;
  uint32_t n = 0;
  for (int k = 0; k < 4; ++k) n = (n << 8) | *p++;
  *n_out = n;
  if (n > out_cap_n) return -2;
  FpCtx<T, BITS> c(e1, e2);

  uint32_t i = 0;
  T xors[GROUP];
  int bcode[GROUP];
  while (i < n) {
    uint32_t in_group = (n - i >= GROUP) ? GROUP : (n - i);
    if (BITS == 32) {
      if (end - p < 3) return -1;
      uint32_t bc = (uint32_t(p[0]) << 16) | (uint32_t(p[1]) << 8) | p[2];
      p += 3;
      for (int k = 0; k < GROUP; ++k) bcode[k] = (bc >> (3 * k)) & 7;
    } else {
      if (end - p < 1) return -1;
      bcode[0] = *p & 15;
      bcode[1] = (*p >> 4) & 15;
      ++p;
    }
    for (uint32_t k = 0; k < in_group; ++k) {
      int b = bcode[k];
      int len = (b <= FCM_MAX) ? b : b - FCM_MAX;
      if (end - p < len) return -1;
      T x = 0;
      for (int q = 0; q < len; ++q) x = (x << 8) | *p++;
      xors[k] = x;
    }
    // (pad slots of a tail group carry 1 zero byte each; we simply don't read
    //  them — the substream size from the archive framing delimits the data,
    //  but reference encoders do emit them, so skip over if present)
    if (in_group < GROUP) {
      for (uint32_t k = in_group; k < GROUP; ++k) {
        int b = bcode[k];
        int len = (b <= FCM_MAX) ? b : b - FCM_MAX;
        if (end - p >= len) p += len;
      }
    }
    for (uint32_t k = 0; k < in_group; ++k) {
      T pred = (bcode[k] > FCM_MAX) ? c.pred2 : c.pred1;
      T v = xors[k] ^ pred;
      c.step_tables(v);
      out[i + k] = v;
    }
    i += in_group;
  }
  return int64_t(p - in);
}

EXPORT int64_t tt_fp32_encode(const uint32_t* in, uint32_t n, uint32_t e1,
                              uint32_t e2, uint8_t* out, int64_t cap) {
  return fp_encode<uint32_t, 32>(in, n, e1, e2, out, cap);
}
EXPORT int64_t tt_fp64_encode(const uint64_t* in, uint32_t n, uint32_t e1,
                              uint32_t e2, uint8_t* out, int64_t cap) {
  return fp_encode<uint64_t, 64>(in, n, e1, e2, out, cap);
}
EXPORT int64_t tt_fp32_decode(const uint8_t* in, int64_t in_size, uint32_t* out,
                              uint32_t cap_n, uint32_t* n_out) {
  return fp_decode<uint32_t, 32>(in, in_size, out, cap_n, n_out);
}
EXPORT int64_t tt_fp64_decode(const uint8_t* in, int64_t in_size, uint64_t* out,
                              uint32_t cap_n, uint32_t* n_out) {
  return fp_decode<uint64_t, 64>(in, in_size, out, cap_n, n_out);
}

// Batch FP substream decode across hardware threads: chunk payloads are
// independent codec instances (fresh predictor tables per chunk), so decode
// parallelizes across chunks at C speed. This is the host decode path for
// table exponents too large for the device one-hot replay (e.g. the f64
// default (20,20): 2^20-entry tables). Returns 0 or -(i+1) on corrupt chunk.
template <typename T, int BITS>
static int64_t fp_decode_blocks(const uint8_t* src, const int64_t* src_off,
                                const int64_t* src_sz, int64_t n_blocks,
                                T* dst, const int64_t* dst_off,
                                const int64_t* dst_n) {
  std::atomic<int64_t> err{0};
  par_chunks(n_blocks, [&](int64_t c) {
    if (err.load(std::memory_order_relaxed)) return;
    uint32_t n_out = 0;
    int64_t rc = fp_decode<T, BITS>(src + src_off[c], src_sz[c],
                                    dst + dst_off[c], uint32_t(dst_n[c]),
                                    &n_out);
    if (rc < 0 || int64_t(n_out) != dst_n[c])
      err.store(c + 1, std::memory_order_relaxed);
  });
  return -err.load();
}

EXPORT int64_t tt_fp32_decode_blocks(const uint8_t* src, const int64_t* src_off,
                                     const int64_t* src_sz, int64_t n_blocks,
                                     uint32_t* dst, const int64_t* dst_off,
                                     const int64_t* dst_n) {
  return fp_decode_blocks<uint32_t, 32>(src, src_off, src_sz, n_blocks, dst,
                                        dst_off, dst_n);
}
EXPORT int64_t tt_fp64_decode_blocks(const uint8_t* src, const int64_t* src_off,
                                     const int64_t* src_sz, int64_t n_blocks,
                                     uint64_t* dst, const int64_t* dst_off,
                                     const int64_t* dst_n) {
  return fp_decode_blocks<uint64_t, 64>(src, src_off, src_sz, n_blocks, dst,
                                        dst_off, dst_n);
}

// ------------------------------------------------- chunked pack / parse
//
// The TPU path computes per-value (bcode, residual) on device (the predictor
// math); these helpers do the byte-level (de)marshalling on the host at memory
// bandwidth. Each chunk payload is a standard FP substream.

EXPORT int64_t tt_fp32_pack_chunks(const uint8_t* bcodes, const uint32_t* res,
                                   int64_t C, int64_t L, uint32_t e1,
                                   uint32_t e2, uint8_t* out, int64_t stride,
                                   int32_t* sizes) {
  if (L % 8 != 0) return -1;
  e1 = (e1 >> 1) << 1;
  if (e1 > 30) e1 = 30;
  e2 = (e2 >> 1) << 1;
  if (e2 > 30) e2 = 30;
  par_chunks(C, [=](int64_t c) {
    const uint8_t* bc = bcodes + c * L;
    const uint32_t* rs = res + c * L;
    uint8_t* p = out + c * stride;
    uint8_t* p0 = p;
    *p++ = uint8_t(((e1 >> 1) << 4) | (e2 >> 1));
    put_be(p, uint32_t(L), 4);
    for (int64_t g = 0; g < L / 8; ++g) {
      uint32_t tag = 0;
      for (int k = 0; k < 8; ++k) tag |= uint32_t(bc[g * 8 + k]) << (3 * k);
      *p++ = uint8_t(tag >> 16);
      *p++ = uint8_t(tag >> 8);
      *p++ = uint8_t(tag);
      for (int k = 0; k < 8; ++k) {
        int b = bc[g * 8 + k];
        int len = (b <= 4) ? b : b - 4;
        put_be(p, rs[g * 8 + k], len);
      }
    }
    sizes[c] = int32_t(p - p0);
  });
  return 0;
}

EXPORT int64_t tt_fp32_parse_chunks(const uint8_t* in, int64_t C,
                                    int64_t stride, int64_t L, uint8_t* bcodes,
                                    uint32_t* xors) {
  if (L % 8 != 0) return -1;
  par_chunks(C, [=](int64_t c) {
    const uint8_t* p = in + c * stride + 5;  // skip hash_info + count
    uint8_t* bc = bcodes + c * L;
    uint32_t* xr = xors + c * L;
    for (int64_t g = 0; g < L / 8; ++g) {
      uint32_t tag = (uint32_t(p[0]) << 16) | (uint32_t(p[1]) << 8) | p[2];
      p += 3;
      for (int k = 0; k < 8; ++k) {
        int b = (tag >> (3 * k)) & 7;
        bc[g * 8 + k] = uint8_t(b);
        int len = (b <= 4) ? b : b - 4;
        uint32_t x = 0;
        for (int q = 0; q < len; ++q) x = (x << 8) | *p++;
        xr[g * 8 + k] = x;
      }
    }
  });
  return 0;
}

EXPORT int64_t tt_fp64_pack_chunks(const uint8_t* bcodes, const uint64_t* res,
                                   int64_t C, int64_t L, uint32_t e1,
                                   uint32_t e2, uint8_t* out, int64_t stride,
                                   int32_t* sizes) {
  if (L % 2 != 0) return -1;
  e1 = (e1 >> 1) << 1;
  if (e1 > 30) e1 = 30;
  e2 = (e2 >> 1) << 1;
  if (e2 > 30) e2 = 30;
  par_chunks(C, [=](int64_t c) {
    const uint8_t* bc = bcodes + c * L;
    const uint64_t* rs = res + c * L;
    uint8_t* p = out + c * stride;
    uint8_t* p0 = p;
    *p++ = uint8_t(((e1 >> 1) << 4) | (e2 >> 1));
    put_be(p, uint32_t(L), 4);
    for (int64_t g = 0; g < L / 2; ++g) {
      int b0 = bc[g * 2], b1 = bc[g * 2 + 1];
      *p++ = uint8_t(b0 | (b1 << 4));
      int len0 = (b0 <= 8) ? b0 : b0 - 8;
      int len1 = (b1 <= 8) ? b1 : b1 - 8;
      put_be(p, rs[g * 2], len0);
      put_be(p, rs[g * 2 + 1], len1);
    }
    sizes[c] = int32_t(p - p0);
  });
  return 0;
}

EXPORT int64_t tt_fp64_parse_chunks(const uint8_t* in, int64_t C,
                                    int64_t stride, int64_t L, uint8_t* bcodes,
                                    uint64_t* xors) {
  if (L % 2 != 0) return -1;
  par_chunks(C, [=](int64_t c) {
    const uint8_t* p = in + c * stride + 5;
    uint8_t* bc = bcodes + c * L;
    uint64_t* xr = xors + c * L;
    for (int64_t g = 0; g < L / 2; ++g) {
      uint8_t tag = *p++;
      int bs[2] = {tag & 15, (tag >> 4) & 15};
      for (int k = 0; k < 2; ++k) {
        int b = bs[k];
        bc[g * 2 + k] = uint8_t(b);
        int len = (b <= 8) ? b : b - 8;
        uint64_t x = 0;
        for (int q = 0; q < len; ++q) x = (x << 8) | *p++;
        xr[g * 2 + k] = x;
      }
    }
  });
  return 0;
}

// -------------------------------------------- v1 <-> v2 chunk relayout
//
// v2 "tpu layout" (trico_tpu/codec/fp_jax.py): same 5-byte header, then ALL
// group tags, then residual bytes in value order — a pure byte permutation of
// the reference layout (identical sizes). These helpers convert padded chunk
// matrices in either direction at memory bandwidth.

EXPORT int64_t tt_fp32_relayout_chunks(const uint8_t* in, int64_t C,
                                       int64_t stride, int64_t L, int to_v2,
                                       uint8_t* out) {
  if (L % 8 != 0) return -1;
  const int64_t G = L / 8;
  par_chunks(C, [=](int64_t c) {
    const uint8_t* p = in + c * stride;
    uint8_t* q = out + c * stride;
    std::memcpy(q, p, 5);
    if (to_v2) {
      const uint8_t* s = p + 5;
      uint8_t* qt = q + 5;
      uint8_t* qr = q + 5 + 3 * G;
      for (int64_t g = 0; g < G; ++g) {
        uint32_t tag = (uint32_t(s[0]) << 16) | (uint32_t(s[1]) << 8) | s[2];
        std::memcpy(qt, s, 3);
        qt += 3;
        s += 3;
        int glen = 0;
        for (int k = 0; k < 8; ++k) {
          int b = (tag >> (3 * k)) & 7;
          glen += (b <= 4) ? b : b - 4;
        }
        std::memcpy(qr, s, size_t(glen));
        qr += glen;
        s += glen;
      }
    } else {
      const uint8_t* st = p + 5;
      const uint8_t* sr = p + 5 + 3 * G;
      uint8_t* qq = q + 5;
      for (int64_t g = 0; g < G; ++g) {
        uint32_t tag = (uint32_t(st[0]) << 16) | (uint32_t(st[1]) << 8) | st[2];
        std::memcpy(qq, st, 3);
        qq += 3;
        st += 3;
        int glen = 0;
        for (int k = 0; k < 8; ++k) {
          int b = (tag >> (3 * k)) & 7;
          glen += (b <= 4) ? b : b - 4;
        }
        std::memcpy(qq, sr, size_t(glen));
        qq += glen;
        sr += glen;
      }
    }
  });
  return 0;
}

EXPORT int64_t tt_fp64_relayout_chunks(const uint8_t* in, int64_t C,
                                       int64_t stride, int64_t L, int to_v2,
                                       uint8_t* out) {
  if (L % 2 != 0) return -1;
  const int64_t G = L / 2;
  par_chunks(C, [=](int64_t c) {
    const uint8_t* p = in + c * stride;
    uint8_t* q = out + c * stride;
    std::memcpy(q, p, 5);
    auto len_of = [](int b) { return (b <= 8) ? b : b - 8; };
    if (to_v2) {
      const uint8_t* s = p + 5;
      uint8_t* qt = q + 5;
      uint8_t* qr = q + 5 + G;
      for (int64_t g = 0; g < G; ++g) {
        uint8_t tag = *s++;
        *qt++ = tag;
        int glen = len_of(tag & 15) + len_of((tag >> 4) & 15);
        std::memcpy(qr, s, size_t(glen));
        qr += glen;
        s += glen;
      }
    } else {
      const uint8_t* st = p + 5;
      const uint8_t* sr = p + 5 + G;
      uint8_t* qq = q + 5;
      for (int64_t g = 0; g < G; ++g) {
        uint8_t tag = *st++;
        *qq++ = tag;
        int glen = len_of(tag & 15) + len_of((tag >> 4) & 15);
        std::memcpy(qq, sr, size_t(glen));
        qq += glen;
        sr += glen;
      }
    }
  });
  return 0;
}

// ---------------------------------------------------------------- LZ4 block

// Own implementation of the public LZ4 block format. Greedy hash-table match
// finder with skip acceleration; emits standard token/literal/offset sequences.
// Interoperates both ways with reference LZ4 block codecs.

static constexpr int LZ_MINMATCH = 4;
static constexpr int LZ_MFLIMIT = 12;      // last match must start 12B before end
static constexpr int LZ_LASTLITERALS = 5;  // final 5 bytes are always literals
static constexpr int LZ_HASH_LOG = 12;

static inline uint64_t load64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;
}

// 5-byte hash (64-bit Fibonacci-style multiply) — markedly fewer collisions
// than a 4-byte hash on structured byte planes, at the same table size.
static inline uint32_t lz_hash(const uint8_t* p) {
  uint64_t seq = load64(p) << 24;  // keep low 5 bytes (little-endian)
  return uint32_t((seq * 889523592379ull) >> (64 - LZ_HASH_LOG));
}

EXPORT int64_t tt_lz4_bound(int64_t n) { return n + n / 255 + 16; }

// match extension with 8-byte word compares (tail handled bytewise)
static inline const uint8_t* lz_extend(const uint8_t* q, const uint8_t* r,
                                       const uint8_t* limit) {
  while (q + 8 <= limit) {
    uint64_t diff = load64(q) ^ load64(r);
    if (diff) return q + (__builtin_ctzll(diff) >> 3);
    q += 8;
    r += 8;
  }
  while (q < limit && *q == *r) {
    ++q;
    ++r;
  }
  return q;
}

EXPORT int64_t tt_lz4_compress(const uint8_t* src, int64_t n, uint8_t* dst,
                               int64_t cap) {
  if (n < 0 || cap < tt_lz4_bound(n)) return -1;
  uint8_t* op = dst;
  const uint8_t* anchor = src;

  auto emit_run = [&](const uint8_t* lit_start, int64_t lit_len, int64_t mlen,
                      uint32_t offset) {
    // token
    uint8_t* token = op++;
    int64_t l = lit_len;
    if (l >= 15) {
      *token = 15 << 4;
      l -= 15;
      while (l >= 255) {
        *op++ = 255;
        l -= 255;
      }
      *op++ = uint8_t(l);
    } else {
      *token = uint8_t(l) << 4;
    }
    std::memcpy(op, lit_start, lit_len);
    op += lit_len;
    if (mlen > 0) {
      *op++ = uint8_t(offset);
      *op++ = uint8_t(offset >> 8);
      int64_t m = mlen - LZ_MINMATCH;
      if (m >= 15) {
        *token |= 15;
        m -= 15;
        while (m >= 255) {
          *op++ = 255;
          m -= 255;
        }
        *op++ = uint8_t(m);
      } else {
        *token |= uint8_t(m);
      }
    }
  };

  if (n >= LZ_MFLIMIT + 1) {
    std::vector<int32_t> table(size_t(1) << LZ_HASH_LOG, -1);
    const uint8_t* ip = src;
    const uint8_t* match_limit = src + n - LZ_LASTLITERALS;
    const uint8_t* mflimit = src + n - LZ_MFLIMIT;
    ip++;  // position 0 has no possible match source
    table[lz_hash(src)] = 0;

    uint32_t search_tries = 1 << 6;  // skip-acceleration counter
    while (ip <= mflimit) {
      uint32_t h = lz_hash(ip);
      int32_t cand = table[h];
      table[h] = int32_t(ip - src);
      if (cand >= 0 && (ip - src) - cand <= 65535 &&
          load32(src + cand) == load32(ip)) {
        search_tries = 1 << 6;  // reset acceleration after a match
        const uint8_t* mp = src + cand;
        // extend forwards
        const uint8_t* q =
            lz_extend(ip + LZ_MINMATCH, mp + LZ_MINMATCH, match_limit);
        // lazy one-step lookahead: a strictly better match starting at ip+1
        // is worth one extra literal (improves the greedy parse)
        if (ip + 1 <= mflimit) {
          uint32_t h2 = lz_hash(ip + 1);
          int32_t cand2 = table[h2];
          if (cand2 >= 0 && (ip + 1 - src) - cand2 <= 65535 &&
              load32(src + cand2) == load32(ip + 1)) {
            const uint8_t* q2 = lz_extend(ip + 1 + LZ_MINMATCH,
                                          src + cand2 + LZ_MINMATCH, match_limit);
            if (q2 - (ip + 1) > (q - ip) + 2) {
              table[h2] = int32_t(ip + 1 - src);
              ++ip;
              mp = src + cand2;
              q = q2;
            }
          }
        }
        // extend backwards over literals
        while (ip > anchor && mp > src && ip[-1] == mp[-1]) {
          --ip;
          --mp;
        }
        int64_t mlen = q - ip;
        emit_run(anchor, ip - anchor, mlen, uint32_t(ip - mp));
        ip = q;
        anchor = ip;
        // seed the table just before the new position, then retry at ip
        // immediately (back-to-back matches emit zero-literal tokens)
        if (ip <= mflimit) table[lz_hash(ip - 2)] = int32_t(ip - 2 - src);
      } else {
        // no match: advance, accelerating through incompressible regions
        ip += (search_tries++) >> 6;
      }
    }
  }
  // final literals
  emit_run(anchor, (src + n) - anchor, 0, 0);
  return op - dst;
}

// Emit a valid LZ4 block from device-found match candidates (offsets per
// position + exact offset-1 run lengths). Candidates are re-verified and
// extended against the actual bytes, so bad candidates cost ratio only.
EXPORT int64_t tt_lz4_emit(const uint8_t* src, int64_t n, const int32_t* cand,
                           const int32_t* rle, uint8_t* dst, int64_t cap) {
  if (cap < tt_lz4_bound(n)) return -1;
  uint8_t* op = dst;
  const uint8_t* anchor = src;

  auto emit_run = [&](const uint8_t* lit_start, int64_t lit_len, int64_t mlen,
                      uint32_t offset) {
    uint8_t* token = op++;
    int64_t l = lit_len;
    if (l >= 15) {
      *token = 15 << 4;
      l -= 15;
      while (l >= 255) {
        *op++ = 255;
        l -= 255;
      }
      *op++ = uint8_t(l);
    } else {
      *token = uint8_t(l) << 4;
    }
    std::memcpy(op, lit_start, size_t(lit_len));
    op += lit_len;
    if (mlen > 0) {
      *op++ = uint8_t(offset);
      *op++ = uint8_t(offset >> 8);
      int64_t m = mlen - LZ_MINMATCH;
      if (m >= 15) {
        *token |= 15;
        m -= 15;
        while (m >= 255) {
          *op++ = 255;
          m -= 255;
        }
        *op++ = uint8_t(m);
      } else {
        *token |= uint8_t(m);
      }
    }
  };

  if (n >= LZ_MFLIMIT + 1) {
    const uint8_t* match_limit = src + n - LZ_LASTLITERALS;
    const uint8_t* mflimit = src + n - LZ_MFLIMIT;
    const uint8_t* ip = src;
    while (ip <= mflimit) {
      int64_t p = ip - src;
      int64_t best_len = 0;
      uint32_t best_off = 0;
      // offset-1 run candidate with exact device-computed length
      int32_t r = rle[p];
      if (r >= LZ_MINMATCH && p >= 1) {
        int64_t len = r;
        if (ip + len > match_limit) len = match_limit - ip;
        if (len >= LZ_MINMATCH) {
          best_len = len;
          best_off = 1;
        }
      }
      // hash-match candidate, verified + extended against the real bytes
      int32_t off = cand[p];
      if (off > 0 && off <= 65535 && p - off >= 0 &&
          load32(src + p - off) == load32(ip)) {
        const uint8_t* q = lz_extend(ip + LZ_MINMATCH,
                                     src + p - off + LZ_MINMATCH, match_limit);
        int64_t len = q - ip;
        if (len > best_len) {
          best_len = len;
          best_off = uint32_t(off);
        }
      }
      if (best_len >= LZ_MINMATCH) {
        const uint8_t* mp = ip - best_off;
        // extend backwards over pending literals
        while (ip > anchor && mp > src && ip[-1] == mp[-1]) {
          --ip;
          --mp;
          ++best_len;
        }
        emit_run(anchor, ip - anchor, best_len, best_off);
        ip += best_len;
        anchor = ip;
      } else {
        ++ip;
      }
    }
  }
  emit_run(anchor, (src + n) - anchor, 0, 0);
  return op - dst;
}

EXPORT int64_t tt_lz4_decompress(const uint8_t* src, int64_t n, uint8_t* dst,
                                 int64_t cap) {
  const uint8_t* ip = src;
  const uint8_t* iend = src + n;
  uint8_t* op = dst;
  uint8_t* oend = dst + cap;
  while (ip < iend) {
    uint8_t token = *ip++;
    // literals
    int64_t lit = token >> 4;
    if (lit == 15) {
      uint8_t s;
      do {
        if (ip >= iend) return -1;
        s = *ip++;
        lit += s;
      } while (s == 255);
    }
    if (ip + lit > iend || op + lit > oend) return -1;
    std::memcpy(op, ip, size_t(lit));
    ip += lit;
    op += lit;
    if (ip >= iend) break;  // last sequence has no match
    // match
    if (ip + 2 > iend) return -1;
    uint32_t offset = uint32_t(ip[0]) | (uint32_t(ip[1]) << 8);
    ip += 2;
    if (offset == 0 || op - dst < int64_t(offset)) return -1;
    int64_t mlen = (token & 15) + LZ_MINMATCH;
    if ((token & 15) == 15) {
      uint8_t s;
      do {
        if (ip >= iend) return -1;
        s = *ip++;
        mlen += s;
      } while (s == 255);
    }
    if (op + mlen > oend) return -1;
    const uint8_t* mp = op - offset;
    if (int64_t(offset) >= mlen) {
      std::memcpy(op, mp, size_t(mlen));  // non-overlapping fast copy
    } else {
      for (int64_t k = 0; k < mlen; ++k) op[k] = mp[k];  // overlapping (RLE)
    }
    op += mlen;
  }
  return op - dst;
}

// Batch block decode across hardware threads: blocks are independent by
// construction (chunked container framing, trico_tpu/chunked.py), unlike the
// reference's strictly sequential per-block loop (lz4.c:1658 decode hot loop).
// Returns 0 on success, -(i+1) when block i is corrupt or mis-sized.
EXPORT int64_t tt_lz4_decompress_blocks(const uint8_t* src, const int64_t* src_off,
                                        const int64_t* src_sz, int64_t n_blocks,
                                        uint8_t* dst, const int64_t* dst_off,
                                        const int64_t* dst_sz) {
  std::atomic<int64_t> err{0};
  par_chunks(n_blocks, [&](int64_t c) {
    if (err.load(std::memory_order_relaxed)) return;
    int64_t got = tt_lz4_decompress(src + src_off[c], src_sz[c],
                                    dst + dst_off[c], dst_sz[c]);
    if (got != dst_sz[c]) err.store(c + 1, std::memory_order_relaxed);
  });
  return -err.load();
}

// Batch block compress across hardware threads: blocks are independent LZ4
// streams (chunked container framing), so the encode side parallelizes just
// like tt_lz4_decompress_blocks. Each block writes into its own cap-sized
// slice of dst; out_sz[i] receives the compressed size (or the whole call
// returns -(i+1) on failure).
EXPORT int64_t tt_lz4_compress_blocks(const uint8_t* src, const int64_t* src_off,
                                      const int64_t* src_sz, int64_t n_blocks,
                                      uint8_t* dst, int64_t cap_per_block,
                                      int64_t* out_sz) {
  std::atomic<int64_t> err{0};
  par_chunks(n_blocks, [&](int64_t c) {
    if (err.load(std::memory_order_relaxed)) return;
    int64_t got = tt_lz4_compress(src + src_off[c], src_sz[c],
                                  dst + c * cap_per_block, cap_per_block);
    if (got < 0)
      err.store(c + 1, std::memory_order_relaxed);
    else
      out_sz[c] = got;
  });
  return -err.load();
}

// ------------------------------------------------------- byte-plane shuffle

EXPORT void tt_shuffle_bytes(const uint8_t* src, int64_t n_elems, int32_t width,
                             uint8_t* dst) {
  // dst[plane][i] = src[i*width + plane]  (AoS -> planar)
  for (int32_t p = 0; p < width; ++p) {
    uint8_t* d = dst + int64_t(p) * n_elems;
    const uint8_t* s = src + p;
    for (int64_t i = 0; i < n_elems; ++i) d[i] = s[i * width];
  }
}

EXPORT void tt_unshuffle_bytes(const uint8_t* src, int64_t n_elems,
                               int32_t width, uint8_t* dst) {
  for (int32_t p = 0; p < width; ++p) {
    const uint8_t* s = src + int64_t(p) * n_elems;
    uint8_t* d = dst + p;
    for (int64_t i = 0; i < n_elems; ++i) d[i * width] = s[i];
  }
}
