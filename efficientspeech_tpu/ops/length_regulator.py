"""Static-shape length regulator (duration-driven feature upsampling).

The reference expands phoneme-rate features to mel-frame rate with a
per-sample Python loop over ``repeat_interleave`` — data-dependent output
shapes that cannot compile to a single XLA program
(reference: layers/networks.py:222-258).

TPU-native formulation: with ``cum = cumsum(durations)``, mel frame ``f``
belongs to the first phoneme ``j`` with ``cum[j] > f``, i.e.
``j = searchsorted(cum, f, side='right')``.  A static-shape gather
``features[j(f)]`` plus a validity mask ``f < mel_len`` is exactly
equivalent to repeat_interleave + padding, with fixed (max_mel_len) output
shape — so the whole text→wav program jit-compiles once per length bucket.
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def length_regulate(features: jnp.ndarray, durations: jnp.ndarray,
                    max_mel_len: int,
                    via_matmul: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Expand phoneme-rate features to frame rate by integer durations.

    Args:
      features: (B, N, C) phoneme-rate features.
      durations: (B, N) non-negative integer frame counts; padded phonemes
        must already carry duration 0.
      max_mel_len: static output length M.
      via_matmul: express the expansion as a ONE-HOT MATMUL instead of a
        gather.  For bf16 features this is BIT-EXACT (each output row
        selects exactly one feature row: 1.0 × bf16 is exact, the single
        nonzero accumulates in f32) and its BACKWARD is a matmul instead
        of the gather's scatter-add — measured 1.18 → ~0.05 ms at the
        batch-128 training shape (benchmarks/train_bisect.py).  Training
        uses it for bf16; f32 paths keep the gather (default matmul
        precision on TPU would round f32 operands).

    Returns:
      (frames, frame_valid, mel_len):
        frames (B, M, C) — frame-rate features, zero beyond ``mel_len``;
        frame_valid (B, M) bool — True for frames < mel_len;
        mel_len (B,) int32 — total frames per sample (may exceed M; callers
        clamp when slicing audio).
    """
    durations = durations.astype(jnp.int32)
    cum = jnp.cumsum(durations, axis=1)                     # (B, N)
    mel_len = cum[:, -1]                                    # (B,)
    frame_pos = jnp.arange(max_mel_len, dtype=jnp.int32)    # (M,)
    frame_valid = frame_pos[None, :] < mel_len[:, None]     # (B, M)

    if via_matmul and features.dtype == jnp.bfloat16:
        # onehot[b, f, j] = 1 iff cum[b, j-1] <= f < cum[b, j]; frames
        # beyond the last phoneme have an all-zero row (already masked)
        prev = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]],
                               axis=1)
        onehot = ((frame_pos[None, :, None] < cum[:, None, :])
                  & (frame_pos[None, :, None] >= prev[:, None, :]))
        frames = jnp.einsum("bmn,bnc->bmc", onehot.astype(features.dtype),
                            features,
                            preferred_element_type=jnp.float32)
        frames = frames.astype(features.dtype)
        frames = jnp.where(frame_valid[:, :, None], frames, 0.0)
        return frames, frame_valid, mel_len

    # frame f → phoneme index: number of cumsum entries <= f.  compare_all
    # (one (M, N) comparison + reduction) vectorizes on the VPU, unlike the
    # default scan-based binary search which serializes log2(N) gathers.
    idx = jax.vmap(
        lambda c: jnp.searchsorted(c, frame_pos, side="right",
                                   method="compare_all")
    )(cum)                                                  # (B, M)
    idx = jnp.minimum(idx, features.shape[1] - 1)

    frames = jnp.take_along_axis(features, idx[:, :, None], axis=1)
    frames = jnp.where(frame_valid[:, :, None], frames, 0.0)
    return frames, frame_valid, mel_len
