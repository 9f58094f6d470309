// Host-side 4-bit block-ADPCM decoder for the device->host wire codec
// (efficientspeech_tpu/audio/adpcm.py documents the format; this mirrors
// the jax encoder's closed loop exactly).  Per 516-byte block: 4-byte
// header (pred0 int16 LE, idx0 u8, reserved) + 512 bytes of packed
// nibbles -> 1024 float32 samples.  Runs at memory speed; the numpy
// fallback in adpcm.py is the portable reference.

#include <cstdint>

namespace {

const int kBlock = 1024;
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
const int8_t kIndex[16] = {-1, -1, -1, -1, 2, 4, 6, 8,
                           -1, -1, -1, -1, 2, 4, 6, 8};

inline int clampi(int v, int lo, int hi) {
  return v < lo ? lo : (v > hi ? hi : v);
}

// The per-sample update depends only on (idx, code): precompute the signed
// prediction delta and the next step index for all 89x16 states so the
// inner loop is two table loads + add + clamp (branchless — random nibbles
// make the bit-test branches unpredictable, ~3x slower).
struct Tables {
  int32_t delta[89][16];
  uint8_t next_idx[89][16];
  Tables() {
    for (int idx = 0; idx < 89; ++idx) {
      int step = kStep[idx];
      for (int code = 0; code < 16; ++code) {
        int vpdiff = step >> 3;
        if (code & 4) vpdiff += step;
        if (code & 2) vpdiff += step >> 1;
        if (code & 1) vpdiff += step >> 2;
        delta[idx][code] = (code & 8) ? -vpdiff : vpdiff;
        next_idx[idx][code] = (uint8_t)clampi(idx + kIndex[code], 0, 88);
      }
    }
  }
};
const Tables kTab;

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
    const uint8_t* codes = p + kHeader;
    float* o = out + (int64_t)blk * kBlock;
    o[0] = (float)(pred * scale);
    // two nibbles (low first) per wire byte; sample t uses nibble t-1
    for (int t = 1; t < kBlock; t += 2) {
      int byte = codes[(t - 1) >> 1];
      int code = byte & 0x0F;
      pred = clampi(pred + kTab.delta[idx][code], -32768, 32767);
      idx = kTab.next_idx[idx][code];
      o[t] = (float)(pred * scale);
      if (t + 1 < kBlock) {
        code = byte >> 4;
        pred = clampi(pred + kTab.delta[idx][code], -32768, 32767);
        idx = kTab.next_idx[idx][code];
        o[t + 1] = (float)(pred * scale);
      }
    }
  }
}
