// Native host-side ops for the input pipeline.
//
// The TPU compute path is JAX/XLA/Pallas; this library accelerates the
// host-side work that feeds it (the reference does this work inside TF's
// C++ runtime via tf.strings.to_hash_bucket_fast and TFRecordDataset —
// deepctr/layers/utils.py:89-112, estimator/inputs.py:22-52):
//
//  - fnv1a64_bucket: vectorized string -> bucket hashing with the same
//    FNV-1a + mask_zero semantics as deepctr_tpu/hashing.py (bit-identical,
//    so the Python path remains a correct fallback).
//  - tfrecord_scan: scan TFRecord framing (u64 len, u32 crc, payload,
//    u32 crc) and emit (offset, length) pairs for zero-copy slicing.
//  - parse_examples: batch-decode tf.train.Example protobuf payloads
//    straight into dense numpy column buffers (the hot loop of the
//    streaming TFRecord input pipeline; role of TF's parse_example op).
//
// Built as a plain shared library (no pybind11; loaded via ctypes).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// FNV-1a 64-bit over each row's bytes. Rows are a contiguous buffer with
// n+1 offsets. mask_zero: rows equal to "0" map to bucket 0, all other rows
// to [1, num_buckets); otherwise plain modulo into [0, num_buckets).
void fnv1a64_bucket(const uint8_t* data, const int64_t* offsets, int64_t n,
                    int64_t num_buckets, int mask_zero, int32_t* out) {
  const uint64_t kOffset = 0xCBF29CE484222325ULL;
  const uint64_t kPrime = 0x100000001B3ULL;
  const int64_t buckets = mask_zero ? num_buckets - 1 : num_buckets;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = data + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    uint64_t h = kOffset;
    for (int64_t j = 0; j < len; ++j) {
      h ^= p[j];
      h *= kPrime;
    }
    int64_t b = (int64_t)(h % (uint64_t)buckets);
    if (mask_zero) {
      const bool is_zero = (len == 1 && p[0] == '0');
      out[i] = is_zero ? 0 : (int32_t)(b + 1);
    } else {
      out[i] = (int32_t)b;
    }
  }
}

// Scan TFRecord framing of a file already loaded into memory. Writes up to
// max_records (offset, length) pairs of the payloads into out_off/out_len.
// Returns the number of records found, or -1 on a malformed file.
int64_t tfrecord_scan(const uint8_t* data, int64_t size, int64_t* out_off,
                      int64_t* out_len, int64_t max_records) {
  int64_t pos = 0;
  int64_t count = 0;
  while (pos + 12 <= size) {
    uint64_t length;
    std::memcpy(&length, data + pos, 8);  // little-endian hosts only
    pos += 12;  // skip length + length-crc
    if (pos + (int64_t)length + 4 > size) return -1;
    if (count < max_records) {
      out_off[count] = pos;
      out_len[count] = (int64_t)length;
    }
    ++count;
    pos += (int64_t)length + 4;  // payload + payload-crc
  }
  // Trailing partial header: surface truncation the same way the Python
  // reader does (ValueError) instead of silently dropping bytes.
  if (pos != size) return -1;
  return count;
}

// --------------------------- FarmHash64 --------------------------------
// Reimplementation of the public FarmHash64 ("na") algorithm — the
// function behind TF's Fingerprint64 / tf.strings.to_hash_bucket_fast
// (reference layers/utils.py:89-112). Bit-exactness vs the installed TF is
// covered by tests/hashing_test.py.

namespace {

constexpr uint64_t kF0 = 0xC3A5C85C97CB3127ULL;
constexpr uint64_t kF1 = 0xB492B66FBE98F273ULL;
constexpr uint64_t kF2 = 0x9AE16A3B2F90404FULL;

inline uint64_t frot(uint64_t v, int s) {
  return s == 0 ? v : (v >> s) | (v << (64 - s));
}
inline uint64_t ff64(const uint8_t* p) {
  uint64_t v;
  std::memcpy(&v, p, 8);
  return v;  // little-endian hosts only (matches tfrecord_scan)
}
inline uint64_t ff32(const uint8_t* p) {
  uint32_t v;
  std::memcpy(&v, p, 4);
  return v;
}
inline uint64_t fsmix(uint64_t v) { return v ^ (v >> 47); }
inline uint64_t fh16(uint64_t u, uint64_t v, uint64_t mul) {
  uint64_t a = (u ^ v) * mul;
  a ^= a >> 47;
  uint64_t b = (v ^ a) * mul;
  b ^= b >> 47;
  return b * mul;
}

inline uint64_t fh0to16(const uint8_t* s, int64_t n) {
  if (n >= 8) {
    uint64_t mul = kF2 + (uint64_t)n * 2;
    uint64_t a = ff64(s) + kF2;
    uint64_t b = ff64(s + n - 8);
    uint64_t c = frot(b, 37) * mul + a;
    uint64_t d = (frot(a, 25) + b) * mul;
    return fh16(c, d, mul);
  }
  if (n >= 4) {
    uint64_t mul = kF2 + (uint64_t)n * 2;
    uint64_t a = ff32(s);
    return fh16((uint64_t)n + (a << 3), ff32(s + n - 4), mul);
  }
  if (n > 0) {
    uint64_t a = s[0], b = s[n >> 1], c = s[n - 1];
    uint64_t y = a + (b << 8);
    uint64_t z = (uint64_t)n + (c << 2);
    return fsmix(y * kF2 ^ z * kF0) * kF2;
  }
  return kF2;
}

inline uint64_t fh17to32(const uint8_t* s, int64_t n) {
  uint64_t mul = kF2 + (uint64_t)n * 2;
  uint64_t a = ff64(s) * kF1;
  uint64_t b = ff64(s + 8);
  uint64_t c = ff64(s + n - 8) * mul;
  uint64_t d = ff64(s + n - 16) * kF2;
  return fh16(frot(a + b, 43) + frot(c, 30) + d,
              a + frot(b + kF2, 18) + c, mul);
}

inline uint64_t fh33to64(const uint8_t* s, int64_t n) {
  uint64_t mul = kF2 + (uint64_t)n * 2;
  uint64_t a = ff64(s) * kF2;
  uint64_t b = ff64(s + 8);
  uint64_t c = ff64(s + n - 8) * mul;
  uint64_t d = ff64(s + n - 16) * kF2;
  uint64_t y = frot(a + b, 43) + frot(c, 30) + d;
  uint64_t z = fh16(y, a + frot(b + kF2, 18) + c, mul);
  uint64_t e = ff64(s + 16) * mul;
  uint64_t f = ff64(s + 24);
  uint64_t g = (y + ff64(s + n - 32)) * mul;
  uint64_t h = (z + ff64(s + n - 24)) * mul;
  return fh16(frot(e + f, 43) + frot(g, 30) + h,
              e + frot(f + a, 18) + g, mul);
}

inline void fweak(const uint8_t* s, uint64_t a, uint64_t b, uint64_t* o0,
                  uint64_t* o1) {
  uint64_t w = ff64(s), x = ff64(s + 8), y = ff64(s + 16), z = ff64(s + 24);
  a += w;
  b = frot(b + a + z, 21);
  uint64_t c = a;
  a += x + y;
  b += frot(a, 44);
  *o0 = a + z;
  *o1 = b + c;
}

inline uint64_t farmhash64(const uint8_t* s, int64_t n) {
  if (n <= 16) return fh0to16(s, n);
  if (n <= 32) return fh17to32(s, n);
  if (n <= 64) return fh33to64(s, n);
  const uint64_t seed = 81;
  uint64_t x = seed;
  uint64_t y = seed * kF1 + 113;
  uint64_t z = fsmix(y * kF2 + 113) * kF2;
  uint64_t v0 = 0, v1 = 0, w0 = 0, w1 = 0;
  x = x * kF2 + ff64(s);
  const uint8_t* end = s + ((n - 1) / 64) * 64;
  const uint8_t* last64 = end + ((n - 1) & 63) - 63;
  do {
    x = frot(x + y + v0 + ff64(s + 8), 37) * kF1;
    y = frot(y + v1 + ff64(s + 48), 42) * kF1;
    x ^= w1;
    y += v0 + ff64(s + 40);
    z = frot(z + w0, 33) * kF1;
    fweak(s, v1 * kF1, x + w0, &v0, &v1);
    fweak(s + 32, z + w1, y + ff64(s + 16), &w0, &w1);
    uint64_t t = z;
    z = x;
    x = t;
    s += 64;
  } while (s != end);
  uint64_t mul = kF1 + ((z & 0xFF) << 1);
  s = last64;
  w0 += (uint64_t)((n - 1) & 63);
  v0 += w0;
  w0 += v0;
  x = frot(x + y + v0 + ff64(s + 8), 37) * mul;
  y = frot(y + v1 + ff64(s + 48), 42) * mul;
  x ^= w1 * 9;
  y += v0 * 9 + ff64(s + 40);
  z = frot(z + w0, 33) * mul;
  fweak(s, v1 * mul, x + w0, &v0, &v1);
  fweak(s + 32, z + w1, y + ff64(s + 16), &w0, &w1);
  uint64_t t = z;
  z = x;
  x = t;
  return fh16(fh16(v0, w0, mul) + fsmix(y) * kF0 + z,
              fh16(v1, w1, mul) + x, mul);
}

}  // namespace

// Vectorized string -> bucket via FarmHash64 (TF Fingerprint64 parity);
// same row/offset layout and mask_zero semantics as fnv1a64_bucket.
void farmhash64_bucket(const uint8_t* data, const int64_t* offsets,
                       int64_t n, int64_t num_buckets, int mask_zero,
                       int32_t* out) {
  const int64_t buckets = mask_zero ? num_buckets - 1 : num_buckets;
  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* p = data + offsets[i];
    const int64_t len = offsets[i + 1] - offsets[i];
    uint64_t h = farmhash64(p, len);
    int64_t b = (int64_t)(h % (uint64_t)buckets);
    if (mask_zero) {
      const bool is_zero = (len == 1 && p[0] == '0');
      out[i] = is_zero ? 0 : (int32_t)(b + 1);
    } else {
      out[i] = (int32_t)b;
    }
  }
}

// ------------------- tf.train.Example batch parsing -------------------
//
// Wire format (proto3 subset actually used by Example):
//   Example   { Features features = 1; }
//   Features  { map<string, Feature> feature = 1; }   // repeated map entry
//   map entry { string key = 1; Feature value = 2; }
//   Feature   { BytesList=1 | FloatList=2 | Int64List=3 }  (value field 1,
//               floats/ints possibly packed)

namespace {

inline bool read_varint(const uint8_t* buf, int64_t size, int64_t* pos,
                        uint64_t* out) {
  uint64_t result = 0;
  int shift = 0;
  while (*pos < size && shift < 64) {
    const uint8_t b = buf[(*pos)++];
    result |= (uint64_t)(b & 0x7F) << shift;
    if (!(b & 0x80)) {
      *out = result;
      return true;
    }
    shift += 7;
  }
  return false;
}

// Decode one Feature message's numeric values into out (capacity `width`).
// kind_out: 2=float, 3=int64 (matching the Feature field number). Returns
// the number of values decoded, or -1 on malformed input / overflow.
inline int64_t decode_feature(const uint8_t* buf, int64_t size,
                              int64_t width, int32_t want_kind,
                              double* out_f, int64_t* out_i) {
  int64_t pos = 0;
  int64_t count = 0;
  while (pos < size) {
    uint64_t tag;
    if (!read_varint(buf, size, &pos, &tag)) return -1;
    const uint32_t field = (uint32_t)(tag >> 3);
    const uint32_t wire = (uint32_t)(tag & 0x7);
    if (wire != 2) return -1;  // all list containers are length-delimited
    uint64_t len;
    if (!read_varint(buf, size, &pos, &len)) return -1;
    if (pos + (int64_t)len > size) return -1;
    const uint8_t* inner = buf + pos;
    const int64_t isize = (int64_t)len;
    pos += (int64_t)len;
    if ((int32_t)field != want_kind) continue;  // e.g. bytes_list: skip
    int64_t ip = 0;
    while (ip < isize) {
      uint64_t itag;
      if (!read_varint(inner, isize, &ip, &itag)) return -1;
      const uint32_t ifield = (uint32_t)(itag >> 3);
      const uint32_t iwire = (uint32_t)(itag & 0x7);
      if (ifield != 1) {  // skip unknown fields
        if (iwire == 0) {
          uint64_t skip;
          if (!read_varint(inner, isize, &ip, &skip)) return -1;
        } else if (iwire == 2) {
          uint64_t skip;
          if (!read_varint(inner, isize, &ip, &skip)) return -1;
          ip += (int64_t)skip;
        } else if (iwire == 5) {
          ip += 4;
        } else if (iwire == 1) {
          ip += 8;
        } else {
          return -1;
        }
        continue;
      }
      if (want_kind == 2) {  // FloatList: packed (wire 2) or single f32
        if (iwire == 2) {
          uint64_t plen;
          if (!read_varint(inner, isize, &ip, &plen)) return -1;
          if (ip + (int64_t)plen > isize || plen % 4) return -1;
          const int64_t nvals = (int64_t)plen / 4;
          for (int64_t v = 0; v < nvals; ++v) {
            if (count >= width) return -1;
            float f;
            std::memcpy(&f, inner + ip + 4 * v, 4);
            out_f[count++] = (double)f;
          }
          ip += (int64_t)plen;
        } else if (iwire == 5) {
          if (count >= width) return -1;
          float f;
          std::memcpy(&f, inner + ip, 4);
          ip += 4;
          out_f[count++] = (double)f;
        } else {
          return -1;
        }
      } else {  // Int64List: packed varints or single varint
        if (iwire == 2) {
          uint64_t plen;
          if (!read_varint(inner, isize, &ip, &plen)) return -1;
          const int64_t pend = ip + (int64_t)plen;
          if (pend > isize) return -1;
          while (ip < pend) {
            uint64_t v;
            if (!read_varint(inner, isize, &ip, &v)) return -1;
            if (count >= width) return -1;
            out_i[count++] = (int64_t)v;
          }
        } else if (iwire == 0) {
          uint64_t v;
          if (!read_varint(inner, isize, &ip, &v)) return -1;
          if (count >= width) return -1;
          out_i[count++] = (int64_t)v;
        } else {
          return -1;
        }
      }
    }
  }
  return count;
}

}  // namespace

// Batch-parse n Example payloads into dense per-feature column buffers.
//
// Schema (nf features): names are a concatenated byte blob with nf+1
// offsets; kinds[j]: 0 = int64 column (out int64), 1 = float column (out
// float32); widths[j] = values per example. out_ptrs[j] points at a buffer
// of n * widths[j] elements of the feature's dtype (caller passes
// zero-initialized buffers). missing[i * nf + j] is set to 1 when record i
// lacks feature j (caller applies defaults).
//
// Returns 0 on success, -(record_index + 1) on a malformed record.
//
// ``strides``: each feature's DESTINATION row stride in elements —
// widths[j] for plain (n, width) arrays, or the dtype-grouped matrix's
// total row width when decoding straight into shuffle-pool rows
// (parse_examples_strided); out_ptrs[j] then points at the feature's
// column offset inside the matrix.
static int64_t parse_examples_core(
    const uint8_t* data, const int64_t* offsets,
    const int64_t* lengths, int64_t n,
    const uint8_t* names, const int64_t* name_offsets,
    const int32_t* kinds, const int64_t* widths, const int64_t* strides,
    int64_t nf, void** out_ptrs, uint8_t* missing) {
  // scratch for one feature's decoded values
  int64_t max_w = 1;
  for (int64_t j = 0; j < nf; ++j)
    if (widths[j] > max_w) max_w = widths[j];
  double* buf_f = new double[max_w];
  int64_t* buf_i = new int64_t[max_w];

  for (int64_t i = 0; i < n; ++i) {
    const uint8_t* rec = data + offsets[i];
    const int64_t rsize = lengths[i];
    for (int64_t j = 0; j < nf; ++j) missing[i * nf + j] = 1;

    int64_t pos = 0;
    while (pos < rsize) {
      uint64_t tag;
      if (!read_varint(rec, rsize, &pos, &tag)) goto malformed;
      {
        const uint32_t field = (uint32_t)(tag >> 3);
        const uint32_t wire = (uint32_t)(tag & 0x7);
        uint64_t len;
        if (wire != 2 || !read_varint(rec, rsize, &pos, &len)) goto malformed;
        if (pos + (int64_t)len > rsize) goto malformed;
        const uint8_t* feats = rec + pos;
        const int64_t fsize = (int64_t)len;
        pos += (int64_t)len;
        if (field != 1) continue;  // not Example.features
        // walk Features.feature map entries
        int64_t fp = 0;
        while (fp < fsize) {
          uint64_t etag;
          if (!read_varint(feats, fsize, &fp, &etag)) goto malformed;
          uint64_t elen;
          if ((etag & 0x7) != 2 ||
              !read_varint(feats, fsize, &fp, &elen))
            goto malformed;
          if (fp + (int64_t)elen > fsize) goto malformed;
          const uint8_t* entry = feats + fp;
          const int64_t esize = (int64_t)elen;
          fp += (int64_t)elen;
          if ((etag >> 3) != 1) continue;
          // map entry: key=1 string, value=2 Feature
          const uint8_t* key = nullptr;
          int64_t key_len = 0;
          const uint8_t* fval = nullptr;
          int64_t fval_len = 0;
          int64_t ep = 0;
          while (ep < esize) {
            uint64_t mtag;
            if (!read_varint(entry, esize, &ep, &mtag)) goto malformed;
            uint64_t mlen;
            if ((mtag & 0x7) != 2 ||
                !read_varint(entry, esize, &ep, &mlen))
              goto malformed;
            if (ep + (int64_t)mlen > esize) goto malformed;
            if ((mtag >> 3) == 1) {
              key = entry + ep;
              key_len = (int64_t)mlen;
            } else if ((mtag >> 3) == 2) {
              fval = entry + ep;
              fval_len = (int64_t)mlen;
            }
            ep += (int64_t)mlen;
          }
          if (!key || !fval) continue;
          // match against the schema (nf is small; linear scan)
          for (int64_t j = 0; j < nf; ++j) {
            const int64_t nlen = name_offsets[j + 1] - name_offsets[j];
            if (nlen != key_len ||
                std::memcmp(names + name_offsets[j], key, key_len) != 0)
              continue;
            const int32_t want = kinds[j] == 1 ? 2 : 3;
            const int64_t got = decode_feature(fval, fval_len, widths[j],
                                               want, buf_f, buf_i);
            if (got != widths[j]) goto malformed;
            if (kinds[j] == 1) {
              float* out = (float*)out_ptrs[j] + i * strides[j];
              for (int64_t v = 0; v < widths[j]; ++v)
                out[v] = (float)buf_f[v];
            } else {
              int64_t* out = (int64_t*)out_ptrs[j] + i * strides[j];
              for (int64_t v = 0; v < widths[j]; ++v) out[v] = buf_i[v];
            }
            missing[i * nf + j] = 0;
            break;
          }
        }
      }
    }
    continue;
  malformed:
    delete[] buf_f;
    delete[] buf_i;
    return -(i + 1);
  }
  delete[] buf_f;
  delete[] buf_i;
  return 0;
}

int64_t parse_examples(const uint8_t* data, const int64_t* offsets,
                       const int64_t* lengths, int64_t n,
                       const uint8_t* names, const int64_t* name_offsets,
                       const int32_t* kinds, const int64_t* widths,
                       int64_t nf, void** out_ptrs, uint8_t* missing) {
  return parse_examples_core(data, offsets, lengths, n, names, name_offsets,
                             kinds, widths, /*strides=*/widths, nf, out_ptrs,
                             missing);
}

int64_t parse_examples_strided(
    const uint8_t* data, const int64_t* offsets, const int64_t* lengths,
    int64_t n, const uint8_t* names, const int64_t* name_offsets,
    const int32_t* kinds, const int64_t* widths, const int64_t* strides,
    int64_t nf, void** out_ptrs, uint8_t* missing) {
  return parse_examples_core(data, offsets, lengths, n, names, name_offsets,
                             kinds, widths, strides, nf, out_ptrs, missing);
}

// Multi-threaded parse: rows are independent, so split [0, n)
// across nthreads workers, each writing its disjoint row range of the
// shared column buffers (same algorithm per row — bit-identical output).
// Returns 0 on success, -(global_record_index + 1) on the first
// malformed record any worker hits.
static int64_t parse_examples_mt_core(
    const uint8_t* data, const int64_t* offsets,
    const int64_t* lengths, int64_t n,
    const uint8_t* names, const int64_t* name_offsets,
    const int32_t* kinds, const int64_t* widths, const int64_t* strides,
    int64_t nf, void** out_ptrs, uint8_t* missing, int64_t nthreads) {
  if (nthreads <= 1 || n < 2 * nthreads)
    return parse_examples_core(data, offsets, lengths, n, names,
                               name_offsets, kinds, widths, strides, nf,
                               out_ptrs, missing);
  std::atomic<int64_t> err(0);  // 0 = ok; else -(global_index + 1)
  std::vector<std::thread> workers;
  const int64_t chunk = (n + nthreads - 1) / nthreads;
  for (int64_t t = 0; t < nthreads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    workers.emplace_back([=, &err]() {
      std::vector<void*> shifted(nf);
      for (int64_t j = 0; j < nf; ++j) {
        const int64_t elem = kinds[j] == 1 ? 4 : 8;
        shifted[j] = (uint8_t*)out_ptrs[j] + lo * strides[j] * elem;
      }
      const int64_t r = parse_examples_core(
          data, offsets + lo, lengths + lo, hi - lo, names, name_offsets,
          kinds, widths, strides, nf, shifted.data(), missing + lo * nf);
      if (r < 0) {
        int64_t expected = 0;
        err.compare_exchange_strong(expected, -(lo + (-r - 1) + 1));
      }
    });
  }
  for (auto& w : workers) w.join();
  return err.load();
}

int64_t parse_examples_mt(const uint8_t* data, const int64_t* offsets,
                          const int64_t* lengths, int64_t n,
                          const uint8_t* names, const int64_t* name_offsets,
                          const int32_t* kinds, const int64_t* widths,
                          int64_t nf, void** out_ptrs, uint8_t* missing,
                          int64_t nthreads) {
  return parse_examples_mt_core(data, offsets, lengths, n, names,
                                name_offsets, kinds, widths,
                                /*strides=*/widths, nf, out_ptrs, missing,
                                nthreads);
}

int64_t parse_examples_strided_mt(
    const uint8_t* data, const int64_t* offsets, const int64_t* lengths,
    int64_t n, const uint8_t* names, const int64_t* name_offsets,
    const int32_t* kinds, const int64_t* widths, const int64_t* strides,
    int64_t nf, void** out_ptrs, uint8_t* missing, int64_t nthreads) {
  return parse_examples_mt_core(data, offsets, lengths, n, names,
                                name_offsets, kinds, widths, strides, nf,
                                out_ptrs, missing, nthreads);
}

// ---------------------------------------------------------------------
// Shuffle-pool pop (streaming.py _Pool.pop_random in ONE GIL-released
// call): distinct-sample `count` of `size` live rows via a partial
// Fisher-Yates over idx_scratch, gather the picked rows of every
// dtype-grouped matrix into its out buffer, then compact — move the
// tail's surviving rows into the holes below the new size (identical
// refill plan to the numpy version: only `count` rows ever move).
void pool_pop(uint8_t* const* mats, const int64_t* row_bytes,
              int64_t ngroups, int64_t size, int64_t count, uint64_t seed,
              int32_t* idx_scratch, uint8_t* const* outs) {
  for (int64_t i = 0; i < size; ++i) idx_scratch[i] = (int32_t)i;
  uint64_t x = seed | 1;  // xorshift64*
  for (int64_t i = 0; i < count; ++i) {
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    const uint64_t r = x * 0x2545F4914F6CDD1DULL;
    const int64_t j = i + (int64_t)(r % (uint64_t)(size - i));
    const int32_t tmp = idx_scratch[i];
    idx_scratch[i] = idx_scratch[j];
    idx_scratch[j] = tmp;
  }
  for (int64_t g = 0; g < ngroups; ++g) {
    const int64_t rb = row_bytes[g];
    uint8_t* mat = mats[g];
    uint8_t* out = outs[g];
    for (int64_t i = 0; i < count; ++i)
      std::memcpy(out + i * rb, mat + (int64_t)idx_scratch[i] * rb, rb);
  }
  // compact: after the partial FY, idx_scratch[count:size] are exactly
  // the surviving rows; pair each hole (picked slot below new_size)
  // with a surviving row >= new_size — the two sets have equal counts
  const int64_t new_size = size - count;
  int64_t si = count;
  for (int64_t i = 0; i < count; ++i) {
    const int64_t hole = (int64_t)idx_scratch[i];
    if (hole >= new_size) continue;
    while (si < size && (int64_t)idx_scratch[si] < new_size) ++si;
    const int64_t src = (int64_t)idx_scratch[si++];
    for (int64_t g = 0; g < ngroups; ++g) {
      const int64_t rb = row_bytes[g];
      std::memcpy(mats[g] + hole * rb, mats[g] + src * rb, rb);
    }
  }
}

}  // extern "C"

// CRC-32C (Castagnoli, reflected 0x82F63B78) with TFRecord's rotation+
// offset masking — the TFRecord WRITER's hot loop (the reader skips CRC
// verification; TF's own reader checks these on files we produce).
// Bit-identical to the pure-Python fallback in estimator/tfrecord.py.
static const uint32_t* crc32c_table() {
  static uint32_t table[256];
  static bool init = false;
  if (!init) {
    for (uint32_t i = 0; i < 256; ++i) {
      uint32_t c = i;
      for (int k = 0; k < 8; ++k) c = (c & 1) ? (c >> 1) ^ 0x82F63B78u : c >> 1;
      table[i] = c;
    }
    init = true;
  }
  return table;
}

extern "C" uint32_t crc32c_masked(const uint8_t* data, int64_t n) {
  const uint32_t* table = crc32c_table();
  uint32_t crc = 0xFFFFFFFFu;
  for (int64_t i = 0; i < n; ++i)
    crc = table[(crc ^ data[i]) & 0xFF] ^ (crc >> 8);
  crc ^= 0xFFFFFFFFu;
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8u;
}
