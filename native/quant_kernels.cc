// Native q8_0 block quantizer: the host-side hot loop of checkpoint /
// GGUF export (reference class: gguf/quants.py:378-403 numpy Q8_0).
//
// The builder host has ONE slow core (~1-3 GB/s effective numpy
// bandwidth) and the numpy quantizer needs ~10 full passes over the
// tensor (abs, blockmax, divide, multiply, round-half-away as
// floor/ceil/where, clip, cast). A 0.6B-param f32 export costs minutes
// that way. This kernel is one read pass + one write pass, bit-identical
// to the numpy path (same f32 IEEE ops, same fp16 RN conversion):
//
//   d   = absmax(block)/127          (f32)
//   q   = roundf(x * (d ? 1/d : 0))  (C roundf = ties away from zero)
//   d16 = (fp16) d                   (round-to-nearest-even)
//
// Exposed with a plain C ABI for ctypes; numpy fallback stays in
// fun_asr_gguf_tpu/formats/quant_np.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// f32 -> IEEE fp16 bits, round-to-nearest-even — bit-identical to
// numpy's astype(float16). Software implementation so the result does
// not depend on -march / FPU flags.
static inline uint16_t f32_to_f16_bits(float f) {
  uint32_t x;
  std::memcpy(&x, &f, 4);
  const uint32_t sign = (x >> 16) & 0x8000u;
  x &= 0x7fffffffu;
  if (x >= 0x47800000u) {                 // overflow or inf/nan
    if (x > 0x7f800000u) return static_cast<uint16_t>(sign | 0x7e00u);  // nan
    return static_cast<uint16_t>(sign | 0x7c00u);                       // inf
  }
  if (x < 0x38800000u) {                  // subnormal half (or zero)
    // add implicit bit, shift with round-to-nearest-even
    const uint32_t shift = 126u - (x >> 23);
    if (shift > 24u) return static_cast<uint16_t>(sign);
    const uint32_t mant = (x & 0x7fffffu) | 0x800000u;
    const uint32_t q = mant >> shift;
    const uint32_t rem = mant & ((1u << shift) - 1u);
    const uint32_t half = 1u << (shift - 1u);
    uint32_t r = q;
    if (rem > half || (rem == half && (q & 1u))) r += 1u;
    return static_cast<uint16_t>(sign | r);
  }
  // normal: rebias exponent, round mantissa to 10 bits (RNE)
  uint32_t r = ((x >> 13) & 0x3ffu) | ((((x >> 23) - 112u) & 0x1fu) << 10);
  const uint32_t rem = x & 0x1fffu;
  if (rem > 0x1000u || (rem == 0x1000u && (r & 1u))) r += 1u;
  return static_cast<uint16_t>(sign | r);
}

static inline void quant_block(const float* x, int8_t* q, uint16_t* d16) {
  float amax = 0.0f;
  for (int i = 0; i < 32; ++i) {
    const float a = std::fabs(x[i]);
    if (a > amax) amax = a;
  }
  float d = amax / 127.0f;
  // subnormal d: 1/d overflows to inf and the int8 cast of the rounded
  // result is UB (ggml's own reference has the same hole). Both the
  // numpy and on-device paths treat such blocks as zero — the fp16
  // scale they store underflows to 0 anyway, so the dequantized block
  // is 0 regardless of q. Flush here for cross-path byte identity.
  if (d < 1.17549435e-38f) {     // FLT_MIN (smallest normal)
    d = 0.0f;
  }
  const float id = (d != 0.0f) ? 1.0f / d : 0.0f;
  for (int i = 0; i < 32; ++i) {
    q[i] = static_cast<int8_t>(std::roundf(x[i] * id));
  }
  *d16 = f32_to_f16_bits(d);
}

}  // namespace

extern "C" {

// Contiguous quantize: x is n_blocks*32 f32 values (blocks along the
// fastest axis); writes n_blocks*32 int8 quants and n_blocks fp16 scales.
void q8_0_quantize_f32(const float* x, int64_t n_blocks, int8_t* q,
                       uint16_t* d) {
  for (int64_t b = 0; b < n_blocks; ++b) {
    quant_block(x + b * 32, q + b * 32, d + b);
  }
}

// Fused transpose + quantize for the GGUF export layout: input is our
// [in_dim, out_dim] row-major matrix; output is quantize(x.T) — for each
// out row, q8_0 blocks run along in_dim (in_dim % 32 == 0). One
// cache-tiled read pass over x, contiguous 32-byte writes per block;
// avoids materializing the f32 transpose (a full strided pass the host
// cannot afford).
void q8_0_quantize_transpose_f32(const float* x, int64_t in_dim,
                                 int64_t out_dim, int8_t* q, uint16_t* d) {
  const int64_t nb = in_dim / 32;     // blocks per output row
  const int64_t CW = 256;             // column tile: 32*256*4 = 32 KB in L1
  std::vector<float> tile(static_cast<size_t>(CW) * 32);
  for (int64_t b = 0; b < nb; ++b) {
    const float* xb = x + b * 32 * out_dim;
    for (int64_t c0 = 0; c0 < out_dim; c0 += CW) {
      const int64_t cw = (out_dim - c0 < CW) ? (out_dim - c0) : CW;
      // transpose 32 x cw into tile[cw][32]: contiguous reads per row
      for (int64_t r = 0; r < 32; ++r) {
        const float* src = xb + r * out_dim + c0;
        for (int64_t c = 0; c < cw; ++c) tile[c * 32 + r] = src[c];
      }
      for (int64_t c = 0; c < cw; ++c) {
        const int64_t row = c0 + c;             // output row index
        quant_block(tile.data() + c * 32, q + row * in_dim + b * 32,
                    d + row * nb + b);
      }
    }
  }
}

// Interleave split (q, d) into the ggml on-disk stream: per block,
// 2-byte fp16 scale then 32 int8 quants (34 bytes).
void q8_0_pack_blocks(const int8_t* q, const uint16_t* d, int64_t n_blocks,
                      uint8_t* out) {
  for (int64_t b = 0; b < n_blocks; ++b) {
    uint8_t* o = out + b * 34;
    std::memcpy(o, d + b, 2);
    std::memcpy(o + 2, q + b * 32, 32);
  }
}

}  // extern "C"
