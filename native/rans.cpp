// rANS (range asymmetric numeral system) codec — native backend for
// brief_pytorch_tpu/nflr/rans.py.
//
// The reference delegates NFLR bitstream coding to compressai's C++ range
// coder (reference utils/Networks.py:1062-1086); this is the equivalent
// native component here.  The construction is byte-exact with the pure
// Python implementation in nflr/rans.py (PRECISION=12 quantized CDFs,
// RANS_L=1<<23 renormalisation, little-end-first emission, stream reversed
// at flush), so blobs encode/decode interchangeably across the two.
//
// Build: make -C native  (produces native/bin/librans.so, loaded via ctypes)

#include <cstdint>
#include <cstring>
#include <vector>

namespace {
constexpr int kPrecision = 12;
constexpr uint64_t kMask = (1u << kPrecision) - 1;
constexpr uint64_t kRansL = 1u << 23;
}  // namespace

extern "C" {

// Encode n symbols; symbol i uses the CDF slice
// cdf_flat[cdf_off[channel_idx[i]] .. cdf_off[channel_idx[i]+1]).
// channel_idx may be null (every symbol uses CDF 0).
// Returns bytes written, or -1 if out_cap is too small.
int64_t rans_encode_indexed(const int32_t* symbols, int64_t n,
                            const uint32_t* cdf_flat, const int64_t* cdf_off,
                            const int32_t* channel_idx,
                            uint8_t* out, int64_t out_cap) {
  std::vector<uint8_t> buf;
  buf.reserve(static_cast<size_t>(n) * 2 + 8);
  uint64_t x = kRansL;
  for (int64_t i = n - 1; i >= 0; --i) {
    const int64_t ch = channel_idx ? channel_idx[i] : 0;
    const uint32_t* cdf = cdf_flat + cdf_off[ch];
    const int64_t s = symbols[i];
    const uint64_t c = cdf[s];
    const uint64_t f = cdf[s + 1] - c;
    const uint64_t x_max = ((kRansL >> kPrecision) << 8) * f;
    while (x >= x_max) {
      buf.push_back(static_cast<uint8_t>(x & 0xFF));
      x >>= 8;
    }
    x = ((x / f) << kPrecision) + (x % f) + c;
  }
  for (int k = 0; k < 4; ++k) {
    buf.push_back(static_cast<uint8_t>(x & 0xFF));
    x >>= 8;
  }
  const int64_t len = static_cast<int64_t>(buf.size());
  if (len > out_cap) return -1;
  for (int64_t i = 0; i < len; ++i) out[i] = buf[len - 1 - i];
  return len;
}

// Decode n symbols into out (int32).  Returns 0 on success, -1 on a
// malformed stream (underrun of the 4 header bytes).
int64_t rans_decode_indexed(const uint8_t* data, int64_t len, int64_t n,
                            const uint32_t* cdf_flat, const int64_t* cdf_off,
                            int64_t n_cdfs, const int32_t* channel_idx,
                            int32_t* out) {
  if (len < 4) return -1;
  // slot -> symbol lookup per CDF
  std::vector<uint16_t> lut(static_cast<size_t>(n_cdfs) << kPrecision);
  for (int64_t ch = 0; ch < n_cdfs; ++ch) {
    const uint32_t* cdf = cdf_flat + cdf_off[ch];
    const int64_t n_sym = cdf_off[ch + 1] - cdf_off[ch] - 1;
    uint16_t* l = lut.data() + (ch << kPrecision);
    for (int64_t s = 0; s < n_sym; ++s)
      for (uint32_t slot = cdf[s]; slot < cdf[s + 1]; ++slot)
        l[slot] = static_cast<uint16_t>(s);
  }
  int64_t pos = 0;
  uint64_t x = 0;
  for (int k = 0; k < 4; ++k) x = (x << 8) | data[pos++];
  for (int64_t i = 0; i < n; ++i) {
    const int64_t ch = channel_idx ? channel_idx[i] : 0;
    const uint32_t* cdf = cdf_flat + cdf_off[ch];
    const uint64_t slot = x & kMask;
    const uint16_t s = lut[(ch << kPrecision) | slot];
    out[i] = s;
    const uint64_t c = cdf[s];
    const uint64_t f = cdf[s + 1] - c;
    x = f * (x >> kPrecision) + slot - c;
    while (x < kRansL && pos < len) x = (x << 8) | data[pos++];
  }
  return 0;
}

}  // extern "C"
