// vsim_tpu native runtime library — C++ equivalents of the reference's
// C/C++ host-side hot paths, rebuilt for the TPU framework's K-major layout.
//
// The reference does all model I/O and quantization in native code
// (gptneox_model_load vsim.cpp:108-458, ggml_quantize_q4_0 utils.cpp:425-482,
// quantize_*.cpp CLIs).  The TPU compute path is jax/XLA/Pallas; this library
// is the native runtime *around* it: multi-GB model files parse and repack at
// memory bandwidth instead of Python-loop speed.
//
// Exposed via ctypes (vsim_tpu/native/__init__.py); every entry point has a
// pure-numpy fallback so the framework works without a compiler.
//
// Build: make -C vsim_tpu/native   (emits libvsim_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <thread>
#include <vector>

namespace {

constexpr int QK = 32;              // Q4_0 block size (ggml.c:204)
constexpr int BLOCK_BYTES = 4 + QK / 2;  // f32 scale + 16 nibble bytes

// Parallel-for over rows: reference used a pthread fork-join pool
// (ggml.c:8150-8743); here a simple blocked std::thread fan-out — these are
// one-shot bulk transforms, not a persistent executor.
template <typename F>
void parallel_rows(int64_t n, const F& fn) {
  unsigned hw = std::thread::hardware_concurrency();
  int64_t nth = std::min<int64_t>(hw ? hw : 1, std::max<int64_t>(n / 1024, 1));
  if (nth <= 1) {
    fn(0, n);
    return;
  }
  std::vector<std::thread> ts;
  int64_t chunk = (n + nth - 1) / nth;
  for (int64_t t = 0; t < nth; ++t) {
    int64_t lo = t * chunk, hi = std::min(n, lo + chunk);
    if (lo >= hi) break;
    ts.emplace_back([=] { fn(lo, hi); });
  }
  for (auto& t : ts) t.join();
}

// C round(): half away from zero — matches quantize_row_q4_0 (ggml.c:239).
inline float round_half_away(float v) {
  return std::floor(std::fabs(v) + 0.5f) * (v < 0 ? -1.f : 1.f);
}

// fp32 -> bf16 round-to-nearest-even (matches XLA/ml_dtypes casting).
inline uint16_t f32_to_bf16(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  uint32_t lsb = (x >> 16) & 1;
  x += 0x7fffu + lsb;
  return static_cast<uint16_t>(x >> 16);
}

inline float f16_to_f32(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t man = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (man == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while ((man & 0x400u) == 0) {
        man <<= 1;
        --exp;
      }
      man &= 0x3ffu;
      bits = sign | (exp << 23) | (man << 13);
    }
  } else if (exp == 31) {
    bits = sign | 0x7f800000u | (man << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
  }
  float f;
  std::memcpy(&f, &bits, 4);
  return f;
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Q4_0 quantization (reference numerics: d = amax/7, q = round(v/d)+8,
// ggml.c:209-250) — row-major [O, K] in, packed [O, K/2] + f32 scales out.
// Returns the 16-bin nibble histogram in hist[16] (utils.cpp:425-482) if
// hist != nullptr.
// ---------------------------------------------------------------------------
void q4_quantize_f32(const float* w, int64_t O, int64_t K, uint8_t* packed,
                     float* scales, int64_t* hist) {
  const int64_t nb = K / QK;
  std::mutex hist_mu;
  int64_t hist_acc[16] = {0};
  parallel_rows(O, [&](int64_t lo_row, int64_t hi_row) {
    int64_t local_hist[16] = {0};
    for (int64_t o = lo_row; o < hi_row; ++o) {
      const float* row = w + o * K;
      uint8_t* prow = packed + o * (K / 2);
      float* srow = scales + o * nb;
      for (int64_t b = 0; b < nb; ++b) {
        const float* blk = row + b * QK;
        float amax = 0.f;
        for (int i = 0; i < QK; ++i) amax = std::max(amax, std::fabs(blk[i]));
        const float d = amax / 7.0f;
        const float id = d != 0.f ? 1.0f / d : 0.0f;
        srow[b] = d;
        for (int i = 0; i < QK; i += 2) {
          int q0 = (int)round_half_away(blk[i] * id) + 8;
          int q1 = (int)round_half_away(blk[i + 1] * id) + 8;
          q0 = q0 < 0 ? 0 : (q0 > 15 ? 15 : q0);
          q1 = q1 < 0 ? 0 : (q1 > 15 ? 15 : q1);
          prow[b * (QK / 2) + i / 2] = (uint8_t)(q0 | (q1 << 4));
          if (hist) {
            ++local_hist[q0];
            ++local_hist[q1];
          }
        }
      }
    }
    if (hist) {
      std::lock_guard<std::mutex> g(hist_mu);
      for (int i = 0; i < 16; ++i) hist_acc[i] += local_hist[i];
    }
  });
  if (hist)
    for (int i = 0; i < 16; ++i) hist[i] = hist_acc[i];
}

// Dequantize row-major packed [O, K/2] + f32 scales -> f32 [O, K]
// (dequantize_row_q4_0, ggml.c:301-334).
void q4_dequantize_f32(const uint8_t* packed, const float* scales, int64_t O,
                       int64_t K, float* out) {
  const int64_t nb = K / QK;
  parallel_rows(O, [&](int64_t lo_row, int64_t hi_row) {
    for (int64_t o = lo_row; o < hi_row; ++o) {
      const uint8_t* prow = packed + o * (K / 2);
      const float* srow = scales + o * nb;
      float* orow = out + o * K;
      for (int64_t b = 0; b < nb; ++b) {
        const float d = srow[b];
        for (int i = 0; i < QK / 2; ++i) {
          uint8_t byte = prow[b * (QK / 2) + i];
          orow[b * QK + 2 * i] = ((int)(byte & 0x0F) - 8) * d;
          orow[b * QK + 2 * i + 1] = ((int)(byte >> 4) - 8) * d;
        }
      }
    }
  });
}

// ---------------------------------------------------------------------------
// ggml 20-byte interleaved stream -> K-major packed [K/2, O] + bf16 scales
// [K/32, O].  THE hot model-load transform: the on-disk layout interleaves a
// f32 scale with 16 nibble bytes per block (ggml.c:213); the TPU layout wants
// two dense transposed planes (quant/q4.py module docstring).
// scale_kind: 0 = f32 out, 1 = bf16 out (uint16 buffer).
// ---------------------------------------------------------------------------
void q4_ggml_to_kmajor(const uint8_t* raw, int64_t O, int64_t K,
                       uint8_t* packed_km, void* scales_km, int scale_kind) {
  const int64_t nb = K / QK;
  const int64_t row_bytes = nb * BLOCK_BYTES;
  parallel_rows(O, [&](int64_t lo_row, int64_t hi_row) {
    for (int64_t o = lo_row; o < hi_row; ++o) {
      const uint8_t* rrow = raw + o * row_bytes;
      for (int64_t b = 0; b < nb; ++b) {
        const uint8_t* blk = rrow + b * BLOCK_BYTES;
        float d;
        std::memcpy(&d, blk, 4);
        if (scale_kind == 1) {
          static_cast<uint16_t*>(scales_km)[b * O + o] = f32_to_bf16(d);
        } else {
          static_cast<float*>(scales_km)[b * O + o] = d;
        }
        const uint8_t* nib = blk + 4;
        uint8_t* dst = packed_km + (b * (QK / 2)) * O + o;
        for (int i = 0; i < QK / 2; ++i) dst[i * O] = nib[i];
      }
    }
  });
}

// Inverse: K-major packed [K/2, O] + f32 scales [K/32, O] -> ggml stream.
void q4_kmajor_to_ggml(const uint8_t* packed_km, const float* scales_km,
                       int64_t O, int64_t K, uint8_t* raw) {
  const int64_t nb = K / QK;
  const int64_t row_bytes = nb * BLOCK_BYTES;
  parallel_rows(O, [&](int64_t lo_row, int64_t hi_row) {
    for (int64_t o = lo_row; o < hi_row; ++o) {
      uint8_t* rrow = raw + o * row_bytes;
      for (int64_t b = 0; b < nb; ++b) {
        uint8_t* blk = rrow + b * BLOCK_BYTES;
        float d = scales_km[b * O + o];
        std::memcpy(blk, &d, 4);
        const uint8_t* src = packed_km + (b * (QK / 2)) * O + o;
        for (int i = 0; i < QK / 2; ++i) blk[4 + i] = src[i * O];
      }
    }
  });
}

// Row-major packed [O, K/2] -> K-major packed [K/2, O] (plain transpose,
// blocked for cache locality).
void u8_transpose(const uint8_t* src, int64_t rows, int64_t cols,
                  uint8_t* dst) {
  constexpr int64_t TB = 64;
  parallel_rows((rows + TB - 1) / TB, [&](int64_t lo_t, int64_t hi_t) {
    for (int64_t rt = lo_t; rt < hi_t; ++rt) {
      int64_t r0 = rt * TB, r1 = std::min(rows, r0 + TB);
      for (int64_t c0 = 0; c0 < cols; c0 += TB) {
        int64_t c1 = std::min(cols, c0 + TB);
        for (int64_t r = r0; r < r1; ++r)
          for (int64_t c = c0; c < c1; ++c) dst[c * rows + r] = src[r * cols + c];
      }
    }
  });
}

// f16 buffer -> f32 buffer (model files store f16 tensors; ftype 1).
void f16_to_f32_buf(const uint16_t* src, int64_t n, float* dst) {
  parallel_rows(n, [&](int64_t lo, int64_t hi) {
    for (int64_t i = lo; i < hi; ++i) dst[i] = f16_to_f32(src[i]);
  });
}

int vsim_native_abi_version() { return 1; }

}  // extern "C"
