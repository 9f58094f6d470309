"""Block-parallel 4-bit fixed-step ADPCM wire codec for the device→host link.

The tunneled device→host payload dominates serving latency after the fixed
relay round; 4-bit ADPCM halves the µ-law payload.  Classic IMA ADPCM
adapts its step index EVERY SAMPLE through a table lookup — on the TPU
those per-sample gathers made the encode scan throughput-bound at ~8 ns/
sample (~6.4 ms per synthesis, measured: benchmarks/compute_sweep.py shows
the cost is invariant to scan length, i.e. gather-bound, not step-bound).

This codec instead fixes the step PER 256-SAMPLE BLOCK (11.6 ms of audio),
chosen from the block's diff statistics: step ≈ max(1.5·mean|Δ|, max|Δ|/3)
snapped to the IMA step table.  Measured quality is *better* than the
adaptive walk (speech-like 40.7 vs 40.0 dB SNR; click-train 25.3 vs 22.7)
because the in-block index walk lags transients while the max-informed
step never badly clips — and the scan body is pure vector arithmetic:

- ENCODE (device, in-graph): blocks are lanes of a ``lax.scan`` over the
  256 time steps; per-lane constants (step, step/2, step/4, step/8) are
  computed once per block.  No gathers inside the loop.
- DECODE (host): the C decoder (native/adpcm.cpp, ctypes) builds a
  16-entry per-code delta table per block and runs branchless at memory
  speed; a vectorised-across-blocks numpy fallback is bit-identical.

Wire layout per block: 4-byte header (pred0 int16 LE, step idx u8,
reserved) + 128 bytes of packed nibbles (samples 1..255 + one pad nibble)
= 132 bytes / 256 samples = 4.125 bits/sample (µ-law: 8).

Quality on speech-like signals: SNR ≈ 40 dB (tested ≥ 32 dB bound) — use
``--transfer mulaw``/``int16`` when exact-telephony companding or
bit-exact WAVs matter more than latency.
"""

import os
from typing import Tuple

import numpy as np

BLOCK = 256
HEADER_BYTES = 4
CODE_BYTES = BLOCK // 2  # 255 nibbles + 1 pad
BLOCK_BYTES = HEADER_BYTES + CODE_BYTES

# step selection: step >= C_MEAN * mean|diff| and >= max|diff| / C_MAX
C_MEAN = 1.5
C_MAX = 3.0

STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32)


# --- device-side encoder (jax, in-graph) -------------------------------------

def encode_blocks_device(wav, block: int = BLOCK):
    """(B, T) float in [-1, 1], T % block == 0 → (B, T//block * block_bytes)
    uint8 wire bytes.  Runs inside jit: per-block step from diff stats
    (one searchsorted per block), then a lax.scan over the block's time
    steps with all blocks of all rows as parallel lanes — the scan body is
    gather-free vector arithmetic."""
    import jax
    import jax.numpy as jnp

    b, t = wav.shape
    assert t % block == 0, (t, block)
    nb = t // block
    x = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
    x = jnp.round(x * 32767.0).astype(jnp.int32)
    lanes = x.reshape(b * nb, block)

    steps_tab = jnp.asarray(STEP_TABLE)

    pred0 = lanes[:, 0]
    adiff = jnp.abs(jnp.diff(lanes, axis=1)).astype(jnp.float32)
    target = jnp.maximum(C_MEAN * adiff.mean(axis=1),
                         adiff.max(axis=1) / C_MAX)
    idx0 = jnp.clip(jnp.searchsorted(steps_tab, target.astype(jnp.int32)),
                    0, 88).astype(jnp.int32)
    # per-lane constants — the only table lookup in the whole encode
    step = steps_tab[idx0]
    h = step >> 1
    q = step >> 2
    s8 = step >> 3

    def step_fn(pred, xt):
        diff = xt - pred
        sign = (diff < 0).astype(jnp.int32)
        d = jnp.abs(diff)
        b2 = (d >= step).astype(jnp.int32)
        d = d - b2 * step
        b1 = (d >= h).astype(jnp.int32)
        d = d - b1 * h
        b0 = (d >= q).astype(jnp.int32)
        code = b2 * 4 + b1 * 2 + b0
        vpdiff = s8 + b2 * step + b1 * h + b0 * q
        pred = jnp.clip(pred + jnp.where(sign == 1, -vpdiff, vpdiff),
                        -32768, 32767)
        return pred, (code + sign * 8).astype(jnp.uint8)

    _, codes = jax.lax.scan(step_fn, pred0, lanes[:, 1:].T)  # (block-1, L)
    codes = codes.T                                          # (L, block-1)
    codes = jnp.concatenate(
        [codes, jnp.zeros((codes.shape[0], 1), jnp.uint8)], axis=1)
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(jnp.uint8)

    header = jnp.stack([
        (pred0 & 0xFF).astype(jnp.uint8),
        ((pred0 >> 8) & 0xFF).astype(jnp.uint8),
        idx0.astype(jnp.uint8),
        jnp.zeros_like(idx0, jnp.uint8),
    ], axis=1)                                          # (lanes, 4)
    block_bytes = jnp.concatenate([header, packed], axis=1)
    return block_bytes.reshape(b, nb * (HEADER_BYTES + block // 2))


# --- host-side decoder --------------------------------------------------------

_lib = None
_lib_tried = False


def _load_lib():
    global _lib, _lib_tried
    if _lib_tried:
        return _lib
    _lib_tried = True
    import ctypes

    from efficientspeech_tpu.utils.native_build import ensure_native

    path = ensure_native("libesadpcm.so")
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        lib.adpcm4_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.adpcm4_decode.restype = None
        if hasattr(lib, "adpcm3_decode"):  # stale .so may predate 3-bit
            lib.adpcm3_decode.argtypes = lib.adpcm4_decode.argtypes
            lib.adpcm3_decode.restype = None
        if hasattr(lib, "adpcm2_decode"):  # ... or the 2-bit variant
            lib.adpcm2_decode.argtypes = lib.adpcm4_decode.argtypes
            lib.adpcm2_decode.restype = None
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def decode_blocks_host(data: np.ndarray) -> np.ndarray:
    """uint8 wire bytes (multiple of BLOCK_BYTES) → float32 samples."""
    data = np.ascontiguousarray(data, np.uint8)
    n_blocks = len(data) // BLOCK_BYTES
    data = data[: n_blocks * BLOCK_BYTES]
    lib = _load_lib()
    if lib is not None:
        import ctypes

        out = np.empty(n_blocks * BLOCK, np.float32)
        lib.adpcm4_decode(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_blocks, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    return _decode_numpy(data, n_blocks)


def _decode_numpy(data: np.ndarray, n_blocks: int) -> np.ndarray:
    """Vectorised-across-blocks fallback (sequential over the 255 steps)."""
    blocks = data.reshape(n_blocks, BLOCK_BYTES)
    pred = (blocks[:, 0].astype(np.int32)
            | (blocks[:, 1].astype(np.int32) << 8))
    pred = (pred ^ 0x8000) - 0x8000  # sign-extend int16
    idx = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    step = STEP_TABLE[idx]
    h, q, s8 = step >> 1, step >> 2, step >> 3
    packed = blocks[:, HEADER_BYTES:]
    codes = np.empty((n_blocks, BLOCK), np.int32)
    codes[:, 0:BLOCK:2] = packed & 0x0F
    codes[:, 1:BLOCK:2] = packed >> 4
    out = np.empty((n_blocks, BLOCK), np.int32)
    out[:, 0] = pred
    for t in range(1, BLOCK):
        code = codes[:, t - 1]
        vpdiff = (s8 + np.where(code & 4, step, 0)
                  + np.where(code & 2, h, 0)
                  + np.where(code & 1, q, 0))
        pred = np.clip(pred + np.where(code & 8, -vpdiff, vpdiff),
                       -32768, 32767)
        out[:, t] = pred
    return (out.reshape(-1) / 32767.0).astype(np.float32)


def elements_for_samples(n_samples: int) -> int:
    """Wire bytes holding n_samples (whole blocks)."""
    return -(-n_samples // BLOCK) * BLOCK_BYTES


def samples_for_elements(n_elements: int) -> int:
    return (n_elements // BLOCK_BYTES) * BLOCK


# --- 3-bit variant (sign + 2 magnitude bits) ---------------------------------
#
# Same fixed-step-per-block design with a coarser quantizer:
# vpdiff = step/4 + b1*step + b0*(step/2).  Measured SNR at the tuned
# selector (step >= max(1.0*mean|d|, max|d|/2)): speech-like 34.6 dB
# (mu-law: ~33), click train 28.7 - and the wire shrinks to 3.125
# bits/sample: 8 codes pack into 3 bytes, 255 codes + 1 pad = 96 bytes
# + 4-byte header per 256-sample block.

BLOCK3 = 256
CODE3_BYTES = BLOCK3 * 3 // 8
BLOCK3_BYTES = HEADER_BYTES + CODE3_BYTES
C3_MEAN = 1.0
C3_MAX = 2.0


def encode3_blocks_device(wav, block: int = BLOCK3):
    """(B, T) float in [-1, 1], T % block == 0 → uint8 wire bytes at
    3.125 bits/sample.  Same scan structure as the 4-bit encoder."""
    import jax
    import jax.numpy as jnp

    b, t = wav.shape
    assert t % block == 0, (t, block)
    nb = t // block
    x = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
    x = jnp.round(x * 32767.0).astype(jnp.int32)
    lanes = x.reshape(b * nb, block)

    steps_tab = jnp.asarray(STEP_TABLE)
    pred0 = lanes[:, 0]
    adiff = jnp.abs(jnp.diff(lanes, axis=1)).astype(jnp.float32)
    target = jnp.maximum(C3_MEAN * adiff.mean(axis=1),
                         adiff.max(axis=1) / C3_MAX)
    idx0 = jnp.clip(jnp.searchsorted(steps_tab, target.astype(jnp.int32)),
                    0, 88).astype(jnp.int32)
    step = steps_tab[idx0]
    h = step >> 1
    s4 = step >> 2

    def step_fn(pred, xt):
        diff = xt - pred
        sign = (diff < 0).astype(jnp.int32)
        d = jnp.abs(diff)
        b1 = (d >= step).astype(jnp.int32)
        d = d - b1 * step
        b0 = (d >= h).astype(jnp.int32)
        vpdiff = s4 + b1 * step + b0 * h
        pred = jnp.clip(pred + jnp.where(sign == 1, -vpdiff, vpdiff),
                        -32768, 32767)
        return pred, (b1 * 2 + b0 + sign * 4).astype(jnp.uint8)

    _, codes = jax.lax.scan(step_fn, pred0, lanes[:, 1:].T)
    codes = codes.T                                       # (L, block-1)
    codes = jnp.concatenate(
        [codes, jnp.zeros((codes.shape[0], 1), jnp.uint8)], axis=1)
    c = codes.reshape(codes.shape[0], block // 8, 8).astype(jnp.int32)
    b0_ = (c[..., 0] | (c[..., 1] << 3) | ((c[..., 2] & 3) << 6))
    b1_ = ((c[..., 2] >> 2) | (c[..., 3] << 1) | (c[..., 4] << 4)
           | ((c[..., 5] & 1) << 7))
    b2_ = ((c[..., 5] >> 1) | (c[..., 6] << 2) | (c[..., 7] << 5))
    packed = jnp.stack([b0_, b1_, b2_], axis=-1).astype(jnp.uint8)
    packed = packed.reshape(packed.shape[0], -1)          # (L, 96)

    header = jnp.stack([
        (pred0 & 0xFF).astype(jnp.uint8),
        ((pred0 >> 8) & 0xFF).astype(jnp.uint8),
        idx0.astype(jnp.uint8),
        jnp.zeros_like(idx0, jnp.uint8),
    ], axis=1)
    block_bytes = jnp.concatenate([header, packed], axis=1)
    return block_bytes.reshape(b, nb * (HEADER_BYTES + block * 3 // 8))


def decode3_blocks_host(data: np.ndarray) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    n_blocks = len(data) // BLOCK3_BYTES
    data = data[: n_blocks * BLOCK3_BYTES]
    lib = _load_lib()
    if lib is not None and hasattr(lib, "adpcm3_decode"):
        import ctypes

        out = np.empty(n_blocks * BLOCK3, np.float32)
        lib.adpcm3_decode(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_blocks, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    return _decode3_numpy(data, n_blocks)


def _decode3_numpy(data: np.ndarray, n_blocks: int) -> np.ndarray:
    blocks = data.reshape(n_blocks, BLOCK3_BYTES)
    pred = (blocks[:, 0].astype(np.int32)
            | (blocks[:, 1].astype(np.int32) << 8))
    pred = (pred ^ 0x8000) - 0x8000
    idx = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    step = STEP_TABLE[idx]
    h, s4 = step >> 1, step >> 2
    packed = blocks[:, HEADER_BYTES:].reshape(n_blocks, BLOCK3 // 8, 3)
    packed = packed.astype(np.int32)
    b0_, b1_, b2_ = packed[..., 0], packed[..., 1], packed[..., 2]
    codes = np.empty((n_blocks, BLOCK3 // 8, 8), np.int32)
    codes[..., 0] = b0_ & 7
    codes[..., 1] = (b0_ >> 3) & 7
    codes[..., 2] = ((b0_ >> 6) & 3) | ((b1_ & 1) << 2)
    codes[..., 3] = (b1_ >> 1) & 7
    codes[..., 4] = (b1_ >> 4) & 7
    codes[..., 5] = ((b1_ >> 7) & 1) | ((b2_ & 3) << 1)
    codes[..., 6] = (b2_ >> 2) & 7
    codes[..., 7] = (b2_ >> 5) & 7
    codes = codes.reshape(n_blocks, BLOCK3)
    out = np.empty((n_blocks, BLOCK3), np.int32)
    out[:, 0] = pred
    for t in range(1, BLOCK3):
        code = codes[:, t - 1]
        vpdiff = (s4 + np.where(code & 2, step, 0)
                  + np.where(code & 1, h, 0))
        pred = np.clip(pred + np.where(code & 4, -vpdiff, vpdiff),
                       -32768, 32767)
        out[:, t] = pred
    return (out.reshape(-1) / 32767.0).astype(np.float32)


def elements3_for_samples(n_samples: int) -> int:
    return -(-n_samples // BLOCK3) * BLOCK3_BYTES


def samples3_for_elements(n_elements: int) -> int:
    return (n_elements // BLOCK3_BYTES) * BLOCK3


# --- 2-bit variant (sign + 1 magnitude bit) -----------------------------------
#
# The extreme end of the wire-size/quality trade (VERDICT r3 next #2
# suggested measuring it for the bandwidth-bound batch path): fixed step
# per block, vpdiff = step/2 + b0*step (levels ±step/2, ±3·step/2).
# 4 codes pack into 1 byte: 255 codes + 1 pad = 64 bytes + 4-byte header
# per 256-sample block = 2.125 bits/sample (adpcm3: 3.125, µ-law: 8).
# Measured SNR at the tuned selector (step >= max(1.3*mean|d|,
# max|d|/3)): speech-like 27.2 dB (adpcm3: 34.6, mu-law: ~33); click
# trains ring badly (the +-step/2 minimum movement is granular noise
# after an impulse) — audibly gritty, OPT-IN for throughput-over-quality
# callers, never the default.

BLOCK2 = 256
CODE2_BYTES = BLOCK2 // 4
BLOCK2_BYTES = HEADER_BYTES + CODE2_BYTES
C2_MEAN = 1.3
C2_MAX = 3.0


def encode2_blocks_device(wav, block: int = BLOCK2):
    """(B, T) float in [-1, 1], T % block == 0 → uint8 wire bytes at
    2.125 bits/sample.  Same scan structure as the 4-bit encoder."""
    import jax
    import jax.numpy as jnp

    b, t = wav.shape
    assert t % block == 0, (t, block)
    nb = t // block
    x = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
    x = jnp.round(x * 32767.0).astype(jnp.int32)
    lanes = x.reshape(b * nb, block)

    steps_tab = jnp.asarray(STEP_TABLE)
    pred0 = lanes[:, 0]
    adiff = jnp.abs(jnp.diff(lanes, axis=1)).astype(jnp.float32)
    target = jnp.maximum(C2_MEAN * adiff.mean(axis=1),
                         adiff.max(axis=1) / C2_MAX)
    idx0 = jnp.clip(jnp.searchsorted(steps_tab, target.astype(jnp.int32)),
                    0, 88).astype(jnp.int32)
    step = steps_tab[idx0]
    h = step >> 1

    def step_fn(pred, xt):
        diff = xt - pred
        sign = (diff < 0).astype(jnp.int32)
        d = jnp.abs(diff)
        b0 = (d >= step).astype(jnp.int32)
        vpdiff = h + b0 * step
        pred = jnp.clip(pred + jnp.where(sign == 1, -vpdiff, vpdiff),
                        -32768, 32767)
        return pred, (b0 + sign * 2).astype(jnp.uint8)

    _, codes = jax.lax.scan(step_fn, pred0, lanes[:, 1:].T)
    codes = codes.T                                       # (L, block-1)
    codes = jnp.concatenate(
        [codes, jnp.zeros((codes.shape[0], 1), jnp.uint8)], axis=1)
    c = codes.reshape(codes.shape[0], block // 4, 4).astype(jnp.int32)
    packed = (c[..., 0] | (c[..., 1] << 2) | (c[..., 2] << 4)
              | (c[..., 3] << 6)).astype(jnp.uint8)       # (L, 64)

    header = jnp.stack([
        (pred0 & 0xFF).astype(jnp.uint8),
        ((pred0 >> 8) & 0xFF).astype(jnp.uint8),
        idx0.astype(jnp.uint8),
        jnp.zeros_like(idx0, jnp.uint8),
    ], axis=1)
    block_bytes = jnp.concatenate([header, packed], axis=1)
    return block_bytes.reshape(b, nb * BLOCK2_BYTES)


def decode2_blocks_host(data: np.ndarray) -> np.ndarray:
    data = np.ascontiguousarray(data, np.uint8)
    n_blocks = len(data) // BLOCK2_BYTES
    data = data[: n_blocks * BLOCK2_BYTES]
    lib = _load_lib()
    if lib is not None and hasattr(lib, "adpcm2_decode"):
        import ctypes

        out = np.empty(n_blocks * BLOCK2, np.float32)
        lib.adpcm2_decode(
            data.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            n_blocks, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
        return out
    return _decode2_numpy(data, n_blocks)


def _decode2_numpy(data: np.ndarray, n_blocks: int) -> np.ndarray:
    blocks = data.reshape(n_blocks, BLOCK2_BYTES)
    pred = (blocks[:, 0].astype(np.int32)
            | (blocks[:, 1].astype(np.int32) << 8))
    pred = (pred ^ 0x8000) - 0x8000
    idx = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    step = STEP_TABLE[idx]
    h = step >> 1
    packed = blocks[:, HEADER_BYTES:].astype(np.int32)   # (nb, 64)
    codes = np.empty((n_blocks, BLOCK2 // 4, 4), np.int32)
    codes[..., 0] = packed & 3
    codes[..., 1] = (packed >> 2) & 3
    codes[..., 2] = (packed >> 4) & 3
    codes[..., 3] = (packed >> 6) & 3
    codes = codes.reshape(n_blocks, BLOCK2)
    out = np.empty((n_blocks, BLOCK2), np.int32)
    out[:, 0] = pred
    for t in range(1, BLOCK2):
        code = codes[:, t - 1]
        vpdiff = h + np.where(code & 1, step, 0)
        pred = np.clip(pred + np.where(code & 2, -vpdiff, vpdiff),
                       -32768, 32767)
        out[:, t] = pred
    return (out.reshape(-1) / 32767.0).astype(np.float32)


def elements2_for_samples(n_samples: int) -> int:
    return -(-n_samples // BLOCK2) * BLOCK2_BYTES


def samples2_for_elements(n_elements: int) -> int:
    return (n_elements // BLOCK2_BYTES) * BLOCK2
