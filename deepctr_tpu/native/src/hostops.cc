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
//
// Built as a plain shared library (no pybind11; loaded via ctypes).

#include <cstdint>
#include <cstdio>
#include <cstring>

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

}  // extern "C"
