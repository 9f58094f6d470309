"""Mel spectrogram decoder (reference: layers/networks.py:261-304).

Depthwise-separable conv blocks over frame-rate features.  Channels-last so
the depthwise k=5 conv + pointwise conv + Tanh + LayerNorm chain fuses well
under XLA; a fused Pallas kernel can be swapped in for the block body (see
``efficientspeech_tpu.ops.pallas``).
"""

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.modules import (
    Conv1d, LayerNorm, Linear, _torch_uniform_init, masked_fill)


class _ParamHolder(nn.Module):
    """Declares exactly the params a Conv1d/LayerNorm submodule would.

    The fused-block path (ops/pallas/decoder_block.py) consumes the raw
    weights of four submodules in one kernel; naming a holder after each
    original submodule keeps the parameter tree (and the flax init RNG
    stream, which is derived from the param path) IDENTICAL to the
    unfused model — checkpoints are interchangeable between the paths.
    """

    decls: Tuple[Tuple[str, Any, Tuple[int, ...]], ...]

    @nn.compact
    def __call__(self):
        return tuple(self.param(name, init, shape)
                     for name, init, shape in self.decls)


class MelDecoder(nn.Module):
    cfg: ModelConfig
    ref_pad_semantics: bool = False
    dtype: jnp.dtype = jnp.float32
    # route the frame-rate LayerNorms through the fused Pallas fwd+bwd
    # kernel (exact semantics; the backward recomputes stats) — the
    # training-step bisection found XLA's LN backward dominates the step
    fused_norm: bool = False
    fused_interpret: bool = False
    # fuse each block-body iteration (masked_fill + dw conv + pw conv +
    # tanh + LayerNorm) into ONE Pallas kernel with a recomputing custom
    # VJP (ops/pallas/decoder_block.py) — same param tree, same numerics
    fused_block: bool = False
    fused_block_tg: int = 4
    # the kernel backward holds ~2x the forward's live f32 temps; it runs
    # at a smaller batch-group to stay inside the 16 MB VMEM limit
    fused_block_tg_bwd: int = 2
    # > 0: raise Mosaic's scoped-vmem cap (MB) for the backward kernel so
    # larger tg_bwd fits (v5e has >16 MB physical VMEM; 16 is the default
    # compiler budget, not the hardware)
    fused_block_bwd_vmem_mb: int = 0

    @nn.compact
    def __call__(self, features: jnp.ndarray,
                 frame_pad_mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """features: (B, M, 4*dim) frame-rate; frame_pad_mask: (B, M) True=pad.

        In native masking mode the padded frame tail is re-zeroed before
        every depthwise conv (the biased proj/LN otherwise revive it and the
        k=5 window would leak it into the last valid frames; the unpadded
        reference sees conv edge-zeros there).
        """
        cfg = self.cfg
        dim = cfg.filter_dim
        dim_x2 = min(4 * dim, 256)
        k = cfg.decoder_kernel_size
        padding = k // 2
        native = not self.ref_pad_semantics

        norm = lambda name: LayerNorm(dtype=self.dtype, name=name,
                                      fused=self.fused_norm,
                                      fused_interpret=self.fused_interpret)
        x = Linear(dim_x2, dtype=self.dtype, name="proj_linear")(features)
        x = jnp.tanh(x)
        skip = norm("proj_norm")(x)

        fuse_block = self.fused_block and dim_x2 % 128 == 0
        if fuse_block:
            from efficientspeech_tpu.ops.pallas.decoder_block import (
                decoder_block_fused)

            # keep = 1.0 on valid frames.  ref_pad_semantics never masks,
            # so it uses all-ones (multiplying by exactly 1.0 in f32 is the
            # identity on bf16/f32 values — same numerics as no mask)
            if native and frame_pad_mask is not None:
                keep = 1.0 - frame_pad_mask.astype(jnp.float32)
            else:
                keep = jnp.ones(x.shape[:2], jnp.float32)

        for b in range(cfg.n_blocks):
            x = skip
            for d in range(cfg.block_depth):
                if fuse_block:
                    dw_k, dw_b = _ParamHolder(
                        (("kernel", _torch_uniform_init(k), (k, 1, dim_x2)),
                         ("bias", _torch_uniform_init(k), (dim_x2,))),
                        name=f"block{b}_conv{d}_dw")()
                    pw_k, pw_b = _ParamHolder(
                        (("kernel", _torch_uniform_init(dim_x2),
                          (1, dim_x2, dim_x2)),
                         ("bias", _torch_uniform_init(dim_x2), (dim_x2,))),
                        name=f"block{b}_conv{d}_pw")()
                    ln_s, ln_b = _ParamHolder(
                        (("scale", nn.initializers.ones, (dim_x2,)),
                         ("bias", nn.initializers.zeros, (dim_x2,))),
                        name=f"block{b}_norm{d}")()
                    x = decoder_block_fused(
                        x.astype(self.dtype), keep, dw_k, dw_b, pw_k, pw_b,
                        ln_s, ln_b, k, 1e-5, self.fused_block_tg,
                        self.fused_block_tg_bwd, self.fused_interpret,
                        self.fused_block_bwd_vmem_mb)
                    continue
                if native:
                    x = masked_fill(x, frame_pad_mask)
                x = Conv1d(dim_x2, kernel_size=k, padding=padding,
                           groups=dim_x2, dtype=self.dtype,
                           name=f"block{b}_conv{d}_dw")(x)
                x = Conv1d(dim_x2, kernel_size=1, dtype=self.dtype,
                           name=f"block{b}_conv{d}_pw")(x)
                x = jnp.tanh(x)
                x = norm(f"block{b}_norm{d}")(x)
            skip = norm(f"block{b}_skip_norm")(x + skip)

        return Linear(cfg.n_mel_channels, dtype=self.dtype,
                      name="mel_linear")(skip)
