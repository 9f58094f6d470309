"""Sequence-parallel folded vocoder: shard the frame axis over the mesh.

The folded HiFi-GAN generator (models/hifigan_folded.py) is a chain of
windowed matmuls ``y[t] = concat(x[t-w..t+w]) @ W`` — a textbook halo
pattern.  For long-form synthesis (audiobook paragraphs, batch-of-one
latency scaling) a single chip's MXU time grows linearly with frames;
sharding frames over an ``sp`` mesh axis divides it by the axis size at
the cost of one neighbor ``ppermute`` pair per op (w ≤ 3 rows × ≤2048
features ≈ 12 KB per edge — ICI noise).

Design (TPU-first, reference has no analogue — cf. reference
hifigan/models.py:44-125 which is a sequential conv stack):

- ``shard_map`` over one mesh axis; mel enters sharded P(None, sp, None).
- Each folded op first applies its pre-activation (so halos carry
  activated values), then exchanges ``w`` edge rows with both neighbors
  (zero at the global ends — exactly the zero-pad of the dense path),
  then runs the same windowed matmul locally.
- Row-validity masking compares GLOBAL row indices (shard offset from
  ``jax.lax.axis_index``), so padded tails behave identically to the
  single-device path.
- The polyphase reshape (row split) is per-row and therefore local.

Numerics: identical math to ``folded_plan_apply`` (same windows, same
matmul precision); outputs match the single-device path to fp tolerance.
"""

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig
from efficientspeech_tpu.models.hifigan_folded import LRELU_SLOPE, leaky

from jax.sharding import PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def _halo_exchange(x: jnp.ndarray, w: int, axis: str, n: int) -> jnp.ndarray:
    """(B, Tl, D) → (B, Tl + 2w, D): neighbours' edge rows, zeros at the
    global boundaries (matching jnp.pad of the dense path)."""
    if w == 0:
        return x
    idx = jax.lax.axis_index(axis)
    fwd = [(i, i + 1) for i in range(n - 1)]     # left neighbor → me
    bwd = [(i + 1, i) for i in range(n - 1)]     # right neighbor → me
    left = jax.lax.ppermute(x[:, -w:, :], axis, fwd)
    right = jax.lax.ppermute(x[:, :w, :], axis, bwd)
    left = jnp.where(idx == 0, 0.0, left)
    right = jnp.where(idx == n - 1, 0.0, right)
    return jnp.concatenate([left, x, right], axis=1)


def _windowed_matmul(xp: jnp.ndarray, W, b, w: int, dtype) -> jnp.ndarray:
    """xp already carries w halo rows on each side; returns (B, Tl, D_out).
    Same mixed-precision contract as hifigan_folded._folded_apply."""
    t = xp.shape[1] - 2 * w
    if w == 0:
        window = xp
    else:
        window = jnp.concatenate(
            [xp[:, i: i + t, :] for i in range(2 * w + 1)], axis=-1)
    precision = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    return jnp.dot(window.astype(dtype), jnp.asarray(W, dtype),
                   preferred_element_type=jnp.float32,
                   precision=precision) + jnp.asarray(b, jnp.float32)


def seq_parallel_vocode(arrays: Dict, meta, cfg: HifiGanConfig,
                        mel: jnp.ndarray,
                        mesh,
                        valid_len: Optional[jnp.ndarray] = None,
                        axis: str = "sp",
                        batch_axis: Optional[str] = None,
                        dtype=jnp.bfloat16) -> jnp.ndarray:
    """mel (B, T, n_mels) with T % mesh.shape[axis] == 0 →
    wav (B, T * total_upsample), frame axis sharded over ``axis``.

    ``arrays``/``meta`` from fold_hifigan_device (replicated).  Intended
    use: jit this under the mesh with mel sharded P(batch_axis, axis,
    None).  ``batch_axis`` composes data parallelism with sequence
    parallelism (halos ride only the ``axis`` dimension; the batch split
    is embarrassingly parallel)."""
    n = int(mesh.shape[axis])
    assert mel.shape[1] % n == 0, (mel.shape, n)
    # halos are single-hop: each shard must hold at least the widest
    # window (rows per shard only grow downstream, widths only shrink)
    max_w = max(meta["widths"].values())
    assert mel.shape[1] // n >= max_w, \
        f"frames/shard {mel.shape[1] // n} < max window {max_w}"
    if valid_len is None:
        valid_len = jnp.full((mel.shape[0],), mel.shape[1], jnp.int32)
    widths = dict(meta["widths"])
    reshape = dict(meta["reshape"])
    valid_mult = dict(meta["valid_mult"])
    num_kernels = len(cfg.resblock_kernel_sizes)

    def local_fn(arrs, x, vlen):
        x = x.astype(jnp.float32)
        idx = jax.lax.axis_index(axis)

        def apply_op(inp, key, pre_lrelu, slope=LRELU_SLOPE, residual=None):
            W, bb = arrs[key]
            w = widths[key]
            src = leaky(inp, slope) if pre_lrelu else inp
            xp = _halo_exchange(src, w, axis, n)
            out = _windowed_matmul(xp, W, bb, w, dtype)
            if residual is not None:
                out = out + residual
            if vlen is not None:
                # mask with GLOBAL row indices
                vrows = vlen * valid_mult[key]
                tl = out.shape[1]
                rows = (jnp.arange(tl, dtype=jnp.int32)[None, :]
                        + idx * tl)
                keep = rows < vrows[:, None]
                out = jnp.where(keep[:, :, None], out, 0.0)
            split = reshape.get(key, 1)
            if split > 1:
                b_, t_, d_ = out.shape
                out = out.reshape(b_, t_ * split, d_ // split)
            return out

        x = apply_op(x, "pre", pre_lrelu=False)
        for i in range(len(cfg.upsample_rates)):
            x = apply_op(x, f"up{i}", pre_lrelu=True)
            xs = None
            for j, rd in enumerate(cfg.resblock_dilation_sizes):
                v = x
                for m in range(len(rd)):
                    t1 = apply_op(v, f"rb{i}_{j}_c1_{m}", pre_lrelu=True)
                    v = apply_op(t1, f"rb{i}_{j}_c2_{m}", pre_lrelu=True,
                                 residual=v)
                xs = v if xs is None else xs + v
            x = xs / num_kernels
        x = apply_op(x, "post", pre_lrelu=True, slope=0.01)
        x = jnp.tanh(x)
        b_, t_, d_ = x.shape
        return x.reshape(b_, t_ * d_)

    if batch_axis is not None:
        assert mel.shape[0] % int(mesh.shape[batch_axis]) == 0, \
            (mel.shape, batch_axis)
    fn = shard_map(
        local_fn, mesh=mesh,
        in_specs=(P(), P(batch_axis, axis, None), P(batch_axis)),
        out_specs=P(batch_axis, axis))
    return fn(arrays, mel, valid_len)
