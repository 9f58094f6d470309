#!/usr/bin/env python3
"""Seventh bisection: post-fused-LN breakdown of the 12.7 ms train step.

With the Pallas LayerNorm in place (round-3), STATUS says "no single op
dominates" — this measures exactly what's left per component so the fused
decoder-block kernel (dw conv + pw conv + tanh + LN in ONE pallas_call,
custom VJP) can be judged against the piece it replaces:

  meldec_fwd/grad        — real MelDecoder, fused_norm=True (current default)
  encrest_grad           — full loss grad with the mel decoder bypassed
                           (features -> mel via one linear): encoder +
                           regulator + losses share
  full-step reference    — benchmarks/train_bisect6.py step_fusedln (cached)

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_bisect7.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.mel_decoder import MelDecoder
from efficientspeech_tpu.training.losses import compute_losses
from efficientspeech_tpu.utils.cache import enable_compilation_cache
from efficientspeech_tpu.utils.host_init import host_init

from benchmarks._chain import per_iter_ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--n-phoneme", type=int, default=128)
    parser.add_argument("--n-mel", type=int, default=1152)
    parser.add_argument("--chain", type=int, default=24)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    enable_compilation_cache()
    dtype = jnp.bfloat16
    b, n, m = args.batch, args.n_phoneme, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)

    rng = np.random.default_rng(0)
    batch = {
        "phoneme": jnp.asarray(rng.integers(1, 150, size=(b, n)), jnp.int32),
        "phoneme_mask": jnp.zeros((b, n), bool),
        "pitch": jnp.asarray(rng.normal(size=(b, n)), jnp.float32),
        "energy": jnp.asarray(rng.normal(size=(b, n)), jnp.float32),
        "duration": jnp.full((b, n), m // n, jnp.int32),
        "mel": jnp.asarray(rng.normal(size=(b, m, 80)), jnp.float32),
        "mel_mask": jnp.zeros((b, m), bool),
    }

    dim = cfg.filter_dim
    frames_in = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), dtype)
    frame_mask = jnp.zeros((b, m), bool)

    cases = {}

    # --- mel decoder alone, fused LN (the current default training path) ---
    meldec = MelDecoder(cfg, dtype=dtype, fused_norm=True)
    md_params = host_init(lambda: meldec.init(
        jax.random.PRNGKey(1), frames_in, frame_mask)["params"], seed=1)
    md_params = jax.tree.map(jnp.asarray, md_params)

    def meldec_fwd(s):
        return jnp.sum(meldec.apply(
            {"params": md_params}, frames_in + s * jnp.bfloat16(1e-3),
            frame_mask).astype(jnp.float32))

    cases["meldec_fwd"] = meldec_fwd
    cases["meldec_grad"] = lambda s: jax.tree_util.tree_reduce(
        jnp.add, jax.tree.map(
            lambda g: jnp.sum(g.astype(jnp.float32)),
            jax.grad(lambda p: jnp.sum(meldec.apply(
                {"params": p}, frames_in + s * jnp.bfloat16(1e-3),
                frame_mask).astype(jnp.float32)))(md_params)))

    # --- everything-but-the-decoder: full loss grad with a skip-decoder
    # (encoder + regulator + one linear to mel + losses) ---
    import flax.linen as nn
    from efficientspeech_tpu.models.acoustic import PhonemeEncoder
    from efficientspeech_tpu.models.modules import Linear, masked_fill

    class SkipDecoderModel(nn.Module):
        cfg: ModelConfig
        dtype: jnp.dtype = jnp.bfloat16

        @nn.compact
        def __call__(self, phoneme, pad_mask, pitch_target=None,
                     energy_target=None, duration_target=None, train=False):
            pred = PhonemeEncoder(self.cfg, dtype=self.dtype,
                                  name="encoder")(
                phoneme, pad_mask, pitch_target=pitch_target,
                energy_target=energy_target,
                duration_target=duration_target, train=train)
            mel = Linear(self.cfg.n_mel_channels, dtype=self.dtype,
                         name="mel_linear")(pred["features"])
            pred["mel"] = masked_fill(mel, ~pred["frame_valid"])
            return pred

    model_skip = SkipDecoderModel(cfg, dtype=dtype)
    sk_params = host_init(lambda: model_skip.init(
        jax.random.PRNGKey(0), batch["phoneme"], batch["phoneme_mask"],
        pitch_target=batch["pitch"], energy_target=batch["energy"],
        duration_target=batch["duration"], train=True)["params"], seed=0)
    sk_params = jax.tree.map(jnp.asarray, sk_params)

    def skip_loss(p, bt):
        pred = model_skip.apply({"params": p}, bt["phoneme"],
                                bt["phoneme_mask"],
                                pitch_target=bt["pitch"],
                                energy_target=bt["energy"],
                                duration_target=bt["duration"], train=True)
        return compute_losses(pred, bt)["loss"]

    cases["encrest_grad"] = lambda s: jax.tree_util.tree_reduce(
        jnp.add, jax.tree.map(
            lambda g: jnp.sum(g.astype(jnp.float32)),
            jax.grad(skip_loss)(
                sk_params, dict(batch, pitch=batch["pitch"] + s * 1e-6))))

    for name, fn in cases.items():
        def make(n_iters, fn=fn):
            @jax.jit
            def chain(seed):
                def body(i, c):
                    return c + fn(seed + i).astype(jnp.float32)
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain
        t0 = time.time()
        try:
            ms = per_iter_ms(make(1), make(args.chain),
                             lambda k: (jnp.float32(k),),
                             args.chain, reps=args.reps)
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {name:14s} {ms:7.2f} ms   [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
