// Host-side 4-bit fixed-step block-ADPCM decoder for the device->host wire
// codec (efficientspeech_tpu/audio/adpcm.py documents the format; this
// mirrors the jax encoder's closed loop exactly).  Per 132-byte block:
// 4-byte header (pred0 int16 LE, step idx u8, reserved) + 128 bytes of
// packed nibbles -> 256 float32 samples.  The step is FIXED per block, so
// the per-code prediction delta is a 16-entry table built once per block
// and the inner loop is branchless table-add-clamp at memory speed; the
// numpy fallback in adpcm.py is the portable reference.

#include <cstdint>

namespace {

const int kBlock = 256;
const int kHeader = 4;
const int kBlockBytes = kHeader + kBlock / 2;

const int16_t kStep[89] = {
    7,     8,     9,     10,    11,    12,    13,    14,    16,    17,
    19,    21,    23,    25,    28,    31,    34,    37,    41,    45,
    50,    55,    60,    66,    73,    80,    88,    97,    107,   118,
    130,   143,   157,   173,   190,   209,   230,   253,   279,   307,
    337,   371,   408,   449,   494,   544,   598,   658,   724,   796,
    876,   963,   1060,  1166,  1282,  1411,  1552,  1707,  1878,  2066,
    2272,  2499,  2749,  3024,  3327,  3660,  4026,  4428,  4871,  5358,
    5894,  6484,  7132,  7845,  8630,  9493,  10442, 11487, 12635, 13899,
    15289, 16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767};

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

}  // namespace

extern "C" void adpcm4_decode(const uint8_t* data, int n_blocks,
                              float* out) {
  // divide in double then narrow, matching numpy's (int / 32767.0)
  // .astype(float32) bit-for-bit
  const double scale = 1.0 / 32767.0;
  for (int blk = 0; blk < n_blocks; ++blk) {
    const uint8_t* p = data + (int64_t)blk * kBlockBytes;
    int pred = (int16_t)(p[0] | (p[1] << 8));
    int idx = clampi(p[2], 0, 88);
    int step = kStep[idx];
    int h = step >> 1, q = step >> 2, s8 = step >> 3;
    int32_t delta[16];
    for (int code = 0; code < 16; ++code) {
      int vpdiff = s8 + ((code & 4) ? step : 0) + ((code & 2) ? h : 0)
                   + ((code & 1) ? q : 0);
      delta[code] = (code & 8) ? -vpdiff : vpdiff;
    }
    const uint8_t* codes = p + kHeader;
    float* o = out + (int64_t)blk * kBlock;
    o[0] = (float)(pred * scale);
    // two nibbles (low first) per wire byte; sample t uses nibble t-1
    for (int t = 1; t < kBlock; t += 2) {
      int byte = codes[(t - 1) >> 1];
      pred = clampi(pred + delta[byte & 0x0F], -32768, 32767);
      o[t] = (float)(pred * scale);
      if (t + 1 < kBlock) {
        pred = clampi(pred + delta[byte >> 4], -32768, 32767);
        o[t + 1] = (float)(pred * scale);
      }
    }
  }
}
