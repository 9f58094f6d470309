"""On-device PCM transfer codecs for high-latency links.

The tunneled TPU's device→host path (~30-90 MB/s with ~30 ms round trips)
dominates end-to-end synthesis latency, so the serving pipeline encodes the
waveform ON DEVICE into the smallest acceptable wire format and decodes on
the host:

- ``"f32"``   raw float32 (4 B/sample) — exact
- ``"int16"`` linear 16-bit PCM (2 B/sample) — the final WAV format anyway,
              so bit-exact w.r.t. the written file
- ``"mulaw"`` G.711-style µ-law companded 8-bit PCM (1 B/sample) —
              telephony-grade (~38 dB SNR); halves the dominant transfer
              again.  Decode is a 256-entry table lookup.
- ``"adpcm4"`` fixed-step block-ADPCM, 4.125 bits/sample (~40 dB SNR on
              speech — see audio/adpcm.py)
- ``"adpcm3"`` 3-bit variant, 3.125 bits/sample (~35 dB on speech; still
              above µ-law)
- ``"adpcm2"`` 2-bit variant, 2.125 bits/sample (~27 dB on speech —
              audibly gritty; opt-in for throughput-bound batch callers)

The reference has no analogue (it synthesizes and consumes on one host);
this is TPU-serving machinery.
"""

import jax.numpy as jnp
import numpy as np

MULAW_MU = 255.0

# host-side decode table: uint8 code -> float32 sample
_dec_y = (np.arange(256, dtype=np.float64) / 127.5) - 1.0
MULAW_DECODE_LUT = (np.sign(_dec_y)
                    * ((1.0 + MULAW_MU) ** np.abs(_dec_y) - 1.0)
                    / MULAW_MU).astype(np.float32)


def encode_device(wav, fmt: str):
    """Encode a float waveform (values in [-1, 1]) inside a jitted program.

    adpcm4 requires the sample count to be a multiple of its 256 block
    (all serving buffer sizes are; see infer.py's frame-level granularity).
    """
    if fmt == "f32":
        return wav.astype(jnp.float32)
    if fmt == "int16":
        return jnp.clip(wav.astype(jnp.float32) * 32768.0,
                        -32768.0, 32767.0).astype(jnp.int16)
    if fmt == "mulaw":
        x = jnp.clip(wav.astype(jnp.float32), -1.0, 1.0)
        y = (jnp.sign(x) * jnp.log1p(MULAW_MU * jnp.abs(x))
             / np.log1p(MULAW_MU))
        return jnp.round((y + 1.0) * 127.5).astype(jnp.uint8)
    if fmt == "adpcm4":
        from efficientspeech_tpu.audio.adpcm import encode_blocks_device

        return encode_blocks_device(wav)
    if fmt == "adpcm3":
        from efficientspeech_tpu.audio.adpcm import encode3_blocks_device

        return encode3_blocks_device(wav)
    if fmt == "adpcm2":
        from efficientspeech_tpu.audio.adpcm import encode2_blocks_device

        return encode2_blocks_device(wav)
    raise ValueError(f"unknown transfer format {fmt!r}")


def decode_host(arr: np.ndarray, fmt: str) -> np.ndarray:
    """Decode a fetched wire buffer back to float32 on the host.

    The returned sample count can exceed the valid region (adpcm4 decodes
    whole blocks) — callers trim to mel_len × upsample afterwards.
    """
    arr = np.asarray(arr)
    if fmt == "f32":
        return arr.astype(np.float32, copy=False)
    if fmt == "int16":
        return arr.astype(np.float32) / 32768.0
    if fmt == "mulaw":
        return MULAW_DECODE_LUT[arr]
    if fmt == "adpcm4":
        from efficientspeech_tpu.audio.adpcm import decode_blocks_host

        return decode_blocks_host(arr)
    if fmt == "adpcm3":
        from efficientspeech_tpu.audio.adpcm import decode3_blocks_host

        return decode3_blocks_host(arr)
    if fmt == "adpcm2":
        from efficientspeech_tpu.audio.adpcm import decode2_blocks_host

        return decode2_blocks_host(arr)
    raise ValueError(f"unknown transfer format {fmt!r}")


def bytes_per_sample(fmt: str) -> float:
    return {"f32": 4, "int16": 2, "mulaw": 1, "adpcm4": 0.516,
            "adpcm3": 0.391, "adpcm2": 0.266}[fmt]


def elements_for_samples(fmt: str, n_samples: int) -> int:
    """Length of the wire array that carries n_samples (for slicing device
    outputs at chunk boundaries; sample-addressable formats are 1:1)."""
    if fmt == "adpcm4":
        from efficientspeech_tpu.audio import adpcm

        return adpcm.elements_for_samples(n_samples)
    if fmt == "adpcm3":
        from efficientspeech_tpu.audio import adpcm

        return adpcm.elements3_for_samples(n_samples)
    if fmt == "adpcm2":
        from efficientspeech_tpu.audio import adpcm

        return adpcm.elements2_for_samples(n_samples)
    return n_samples


def samples_for_elements(fmt: str, n_elements: int) -> int:
    if fmt == "adpcm4":
        from efficientspeech_tpu.audio import adpcm

        return adpcm.samples_for_elements(n_elements)
    if fmt == "adpcm3":
        from efficientspeech_tpu.audio import adpcm

        return adpcm.samples3_for_elements(n_elements)
    if fmt == "adpcm2":
        from efficientspeech_tpu.audio import adpcm

        return adpcm.samples2_for_elements(n_elements)
    return n_elements
