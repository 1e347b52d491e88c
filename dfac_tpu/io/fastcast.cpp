// Native host-side ingest kernels for the serving/eval pipelines.
//
// The disk -> scores path (reference analogue: torch DataLoader worker
// processes feeding CUDA, /root/reference/src/predict.py:60-111) spends
// its host time in one place on this framework: casting float32 feature
// rows to bfloat16 before the (async) device upload — numpy's
// ml_dtypes astype is single-threaded. This file provides the same cast
// round-to-nearest-even, bit-exact with ml_dtypes/Eigen, fanned over a
// thread pool, reading straight from the memory-mapped corpus (page
// faults then also parallelize across threads, overlapping disk read
// with conversion).
//
// Built lazily by dfac_tpu/io/fastcast.py with portable flags
//   g++ -O3 -shared -fPIC -pthread
// (deliberately NO -march=native: the binary is cached and may outlive
// the build host — see fastcast.py's flag policy; DFAC_TPU_NATIVE_CFLAGS
// opts in to stronger flags) and loaded through ctypes; every entry
// point is plain C ABI. Callers validate gather indices — these kernels
// do no bounds checking.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

// float32 -> bfloat16, round-to-nearest-even, NaN quieted.
// Matches ml_dtypes (Eigen float_to_bfloat16_rtne): verified bit-exact
// by tests/test_fastcast.py over specials and random sweeps.
inline uint16_t f32_to_bf16(uint32_t bits) {
  if ((bits & 0x7fffffffu) > 0x7f800000u) {  // NaN -> canonical quiet NaN
    return static_cast<uint16_t>(((bits >> 16) & 0x8000u) | 0x7fc0u);
  }
  const uint32_t lsb = (bits >> 16) & 1u;
  return static_cast<uint16_t>((bits + 0x7fffu + lsb) >> 16);
}

void cast_range(const float* src, uint16_t* dst, int64_t lo, int64_t hi) {
  const uint32_t* s = reinterpret_cast<const uint32_t*>(src);
  for (int64_t i = lo; i < hi; ++i) dst[i] = f32_to_bf16(s[i]);
}

void parallel_for(int64_t n, int threads,
                  void (*body)(const float*, uint16_t*, int64_t, int64_t),
                  const float* src, uint16_t* dst) {
  if (threads <= 1 || n < (1 << 16)) {
    body(src, dst, 0, n);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t chunk = (n + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n ? lo + chunk : n;
    if (lo >= hi) break;
    pool.emplace_back(body, src, dst, lo, hi);
  }
  for (auto& th : pool) th.join();
}

void gather_range(const float* src, const int64_t* idx, int64_t row_elems,
                  uint16_t* dst, int64_t lo, int64_t hi) {
  const uint32_t* s = reinterpret_cast<const uint32_t*>(src);
  for (int64_t r = lo; r < hi; ++r) {
    const uint32_t* row = s + idx[r] * row_elems;
    uint16_t* out = dst + r * row_elems;
    for (int64_t i = 0; i < row_elems; ++i) out[i] = f32_to_bf16(row[i]);
  }
}

}  // namespace

extern "C" {

// Contiguous cast: dst[i] = bf16(src[i]) for i in [0, n).
void dfac_cast_f32_bf16(const float* src, uint16_t* dst, int64_t n,
                        int threads) {
  parallel_for(n, threads, cast_range, src, dst);
}

// Row gather + cast: dst[r] = bf16(src[idx[r]]) for r in [0, n_rows);
// src rows are row_elems float32 each. Serves shuffled batch assembly
// straight off the memory-mapped store without an f32 intermediate.
void dfac_gather_cast_f32_bf16(const float* src, const int64_t* idx,
                               int64_t n_rows, int64_t row_elems,
                               uint16_t* dst, int threads) {
  if (threads <= 1 || n_rows * row_elems < (1 << 16)) {
    gather_range(src, idx, row_elems, dst, 0, n_rows);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t chunk = (n_rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n_rows ? lo + chunk : n_rows;
    if (lo >= hi) break;
    pool.emplace_back(gather_range, src, idx, row_elems, dst, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// ---- int8 quantized ingest -------------------------------------------
//
// Serving transfers are the wall on thin host->device links (PCIe on a
// production host, the tunnel relay on the bench rig — measured in
// results/v5e_measurements.md). Quantizing feature rows to int8 with a
// per-(row, group) symmetric scale halves the bytes again vs bf16:
// for (n_rows, F, T) corpora the group is a feature dim's T contiguous
// frames, so each (row, f) stretch gets scale = amax/127 and
// q = rint(x / scale) in [-127, 127]. The device dequantizes
// (q * scale) fused into the first conv. Bit-exact with the numpy
// fallback in fastcast.py (same f32 divide + round-to-nearest-even).

void quant_rows(const float* src, int64_t n_groups, int64_t group_elems,
                int8_t* q, float* scales, int64_t lo, int64_t hi) {
  for (int64_t g = lo * n_groups; g < hi * n_groups; ++g) {
    const float* x = src + g * group_elems;
    int8_t* out = q + g * group_elems;
    float amax = 0.0f;
    for (int64_t i = 0; i < group_elems; ++i) {
      const float a = x[i] < 0.0f ? -x[i] : x[i];
      if (a > amax) amax = a;
    }
    const float scale = amax > 0.0f ? amax / 127.0f : 1.0f;
    scales[g] = scale;
    for (int64_t i = 0; i < group_elems; ++i) {
      float r = __builtin_nearbyintf(x[i] / scale);
      if (r > 127.0f) r = 127.0f;
      if (r < -127.0f) r = -127.0f;
      out[i] = static_cast<int8_t>(r);
    }
  }
}

void run_rows(int64_t n_rows, int64_t row_elems, int threads,
              const std::function<void(int64_t, int64_t)>& body) {
  if (threads <= 1 || n_rows * row_elems < (1 << 16) || n_rows <= 1) {
    body(0, n_rows);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t chunk = (n_rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n_rows ? lo + chunk : n_rows;
    if (lo >= hi) break;
    pool.emplace_back(body, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// Plain parallel memcpy of rows (f32 -> f32) for the non-bf16 paths:
// parallelizes the page-fault/copy cost of pulling memmap rows.
void dfac_gather_f32(const float* src, const int64_t* idx, int64_t n_rows,
                     int64_t row_elems, float* dst, int threads) {
  auto body = [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      std::memcpy(dst + r * row_elems, src + idx[r] * row_elems,
                  sizeof(float) * row_elems);
    }
  };
  if (threads <= 1 || n_rows <= 1) {
    body(0, n_rows);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(threads);
  const int64_t chunk = (n_rows + threads - 1) / threads;
  for (int t = 0; t < threads; ++t) {
    const int64_t lo = t * chunk;
    const int64_t hi = lo + chunk < n_rows ? lo + chunk : n_rows;
    if (lo >= hi) break;
    pool.emplace_back(body, lo, hi);
  }
  for (auto& th : pool) th.join();
}

// Contiguous per-group int8 quantize: src is (n_rows, n_groups,
// group_elems) float32; writes q (same shape, int8) and scales
// (n_rows, n_groups) float32.
void dfac_quant_i8(const float* src, int64_t n_rows, int64_t n_groups,
                   int64_t group_elems, int8_t* q, float* scales,
                   int threads) {
  run_rows(n_rows, n_groups * group_elems, threads,
           [=](int64_t lo, int64_t hi) {
             quant_rows(src, n_groups, group_elems, q, scales, lo, hi);
           });
}

// Row gather + int8 quantize: row r of the output quantizes
// src[idx[r]] — shuffled batch assembly straight off the memory-mapped
// corpus with no float32 intermediate.
void dfac_gather_quant_i8(const float* src, const int64_t* idx,
                          int64_t n_rows, int64_t n_groups,
                          int64_t group_elems, int8_t* q, float* scales,
                          int threads) {
  const int64_t row_elems = n_groups * group_elems;
  run_rows(n_rows, row_elems, threads, [=](int64_t lo, int64_t hi) {
    for (int64_t r = lo; r < hi; ++r) {
      quant_rows(src + idx[r] * row_elems, n_groups, group_elems,
                 q + r * row_elems, scales + r * n_groups, 0, 1);
    }
  });
}

int dfac_native_abi_version(void) { return 2; }

}  // extern "C"
