"""Block-parallel 4-bit IMA-style ADPCM wire codec for the device→host link.

The tunneled device→host payload dominates serving latency after the fixed
relay round (STATUS: ~16 ms of a 69 ms synthesis for µ-law); 4-bit ADPCM
halves it again.  Plain IMA ADPCM is a sequential closed-loop predictor —
hostile to both the TPU (no scan-free form) and chunked fetching — so the
stream is cut into independent 1024-sample blocks:

- ENCODE (device, in-graph): blocks become lanes of a ``lax.scan`` over the
  1024 time steps — the scan is sequential but every block encodes in
  parallel on the VPU.  Each block stores its own header (first sample as
  int16 + adapted step index estimated from the block's mean |diff|), so
  blocks decode independently: a chunked fetch can decode any prefix.
- DECODE (host): the C decoder (native/adpcm.cpp, ctypes) runs at memory
  speed; a vectorised-across-blocks numpy fallback keeps the path portable.

Wire layout per block: 4-byte header (pred0 int16 LE, idx0 u8, reserved)
+ 512 bytes of packed nibbles (samples 1..1023 + one pad nibble)
= 516 bytes / 1024 samples ≈ 4.03 bits/sample (µ-law: 8).

Quality on speech-like signals: SNR ≥ 26 dB (tested) — telephony-grade,
a notch below µ-law (~33 dB); use ``--transfer mulaw``/``int16`` when
fidelity matters more than latency.
"""

import os
from typing import Tuple

import numpy as np

BLOCK = 1024
HEADER_BYTES = 4
CODE_BYTES = BLOCK // 2  # 1023 nibbles + 1 pad
BLOCK_BYTES = HEADER_BYTES + CODE_BYTES

STEP_TABLE = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894, 6484,
    7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289, 16818,
    18500, 20350, 22385, 24623, 27086, 29794, 32767], np.int32)
INDEX_TABLE = np.array([-1, -1, -1, -1, 2, 4, 6, 8,
                        -1, -1, -1, -1, 2, 4, 6, 8], np.int32)


# --- device-side encoder (jax, in-graph) -------------------------------------

def encode_blocks_device(wav, block: int = BLOCK):
    """(B, T) float in [-1, 1], T % block == 0 → (B, T//block * block_bytes)
    uint8 wire bytes.  Runs inside jit: lax.scan over the block's time
    steps, all blocks of all rows as parallel lanes.  ``block`` must match
    the decoder's (wire format constant; non-default sizes are for
    measurement only)."""
    import jax
    import jax.numpy as jnp

    b, t = wav.shape
    assert t % block == 0, (t, block)
    nb = t // block
    x = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
    x = jnp.round(x * 32767.0).astype(jnp.int32)
    lanes = x.reshape(b * nb, block)

    steps = jnp.asarray(STEP_TABLE)
    itab = jnp.asarray(INDEX_TABLE)

    pred0 = lanes[:, 0]
    # initial step index from the block's mean |first difference| — the
    # closed loop adapts within a few samples either way
    mad = jnp.abs(jnp.diff(lanes, axis=1)).mean(axis=1).astype(jnp.int32)
    idx0 = jnp.clip(jnp.searchsorted(steps, mad), 0, 88).astype(jnp.int32)

    def step_fn(carry, xt):
        pred, idx = carry
        step = steps[idx]
        diff = xt - pred
        sign = (diff < 0).astype(jnp.int32)
        d = jnp.abs(diff)
        b2 = (d >= step).astype(jnp.int32)
        d = d - b2 * step
        h = step >> 1
        b1 = (d >= h).astype(jnp.int32)
        d = d - b1 * h
        q = step >> 2
        b0 = (d >= q).astype(jnp.int32)
        code = b2 * 4 + b1 * 2 + b0
        vpdiff = (step >> 3) + b2 * step + b1 * h + b0 * q
        pred = jnp.clip(pred + jnp.where(sign == 1, -vpdiff, vpdiff),
                        -32768, 32767)
        idx = jnp.clip(idx + itab[code + sign * 8], 0, 88)
        return (pred, idx), (code + sign * 8).astype(jnp.uint8)

    (_, _), codes = jax.lax.scan(step_fn, (pred0, idx0),
                                 lanes[:, 1:].T)       # (BLOCK-1, lanes)
    codes = codes.T                                     # (lanes, BLOCK-1)
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
    """Vectorised-across-blocks fallback (sequential over the 1023 steps)."""
    blocks = data.reshape(n_blocks, BLOCK_BYTES)
    pred = (blocks[:, 0].astype(np.int32)
            | (blocks[:, 1].astype(np.int32) << 8))
    pred = (pred ^ 0x8000) - 0x8000  # sign-extend int16
    idx = np.clip(blocks[:, 2].astype(np.int32), 0, 88)
    packed = blocks[:, HEADER_BYTES:]
    codes = np.empty((n_blocks, BLOCK), np.int32)
    codes[:, 0:BLOCK:2] = packed & 0x0F
    codes[:, 1:BLOCK:2] = packed >> 4
    out = np.empty((n_blocks, BLOCK), np.int32)
    out[:, 0] = pred
    steps, itab = STEP_TABLE, INDEX_TABLE
    for t in range(1, BLOCK):
        code = codes[:, t - 1]
        step = steps[idx]
        vpdiff = ((step >> 3) + np.where(code & 4, step, 0)
                  + np.where(code & 2, step >> 1, 0)
                  + np.where(code & 1, step >> 2, 0))
        pred = np.clip(pred + np.where(code & 8, -vpdiff, vpdiff),
                       -32768, 32767)
        idx = np.clip(idx + itab[code], 0, 88)
        out[:, t] = pred
    return (out.reshape(-1) / 32767.0).astype(np.float32)


def elements_for_samples(n_samples: int) -> int:
    """Wire bytes holding n_samples (whole blocks)."""
    return -(-n_samples // BLOCK) * BLOCK_BYTES


def samples_for_elements(n_elements: int) -> int:
    return (n_elements // BLOCK_BYTES) * BLOCK
