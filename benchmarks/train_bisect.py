#!/usr/bin/env python3
"""Bisect the training step's 14.5 ms (round-3 VERDICT next #3).

Round-2 measured gather 0.03 + forward 5.1 + backward/optimizer 9.6 ms at
batch 128 and stopped at "small-op bound".  This script chain-times the
step's PIECES standalone (forward and forward+backward each):

  enc    — phoneme-rate encoder + pitch/energy/duration decoders
  reg    — length-regulator gather (B,N,C) → (B,M,C) (bwd = scatter-add)
  reg_mm — the same regulator as a one-hot MATMUL (bwd = matmul)
  meldec — frame-rate mel decoder (depthwise+pointwise conv blocks)
  loss   — full model loss
  step   — full train step incl. AdamW

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_bisect.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from efficientspeech_tpu.config import ModelConfig, TrainConfig
from efficientspeech_tpu.models.mel_decoder import MelDecoder
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
from efficientspeech_tpu.ops.length_regulator import length_regulate
from efficientspeech_tpu.training.losses import compute_losses
from efficientspeech_tpu.utils.cache import enable_compilation_cache
from efficientspeech_tpu.utils.host_init import host_init

from benchmarks._chain import per_iter_ms


def one_hot_regulate(features, durations, max_mel_len):
    """Exact one-hot-matmul formulation of length_regulate: frames =
    onehot(idx) @ features — forward is an (M,N)@(N,C) matmul per sample
    and the BACKWARD is a matmul too (vs the gather's scatter-add)."""
    durations = durations.astype(jnp.int32)
    cum = jnp.cumsum(durations, axis=1)
    mel_len = cum[:, -1]
    frame_pos = jnp.arange(max_mel_len, dtype=jnp.int32)
    # onehot[b, f, j] = 1 iff cum[b, j-1] <= f < cum[b, j]
    below = frame_pos[None, :, None] < cum[:, None, :]          # (B, M, N)
    prev = jnp.concatenate([jnp.zeros_like(cum[:, :1]), cum[:, :-1]], 1)
    at_or_after = frame_pos[None, :, None] >= prev[:, None, :]
    onehot = (below & at_or_after).astype(features.dtype)
    frames = jnp.einsum("bmn,bnc->bmc", onehot, features,
                        preferred_element_type=jnp.float32)
    frame_valid = frame_pos[None, :] < mel_len[:, None]
    frames = jnp.where(frame_valid[:, :, None], frames.astype(features.dtype),
                       0.0)
    return frames, frame_valid, mel_len


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--n-phoneme", type=int, default=128)
    parser.add_argument("--n-mel", type=int, default=1152)
    parser.add_argument("--chain", type=int, default=24)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--precision", default="bf16",
                        choices=["bf16", "f32"])
    args = parser.parse_args()

    enable_compilation_cache()
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    b, n, m = args.batch, args.n_phoneme, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)
    model = Phoneme2Mel(cfg, dtype=dtype)

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

    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), batch["phoneme"], batch["phoneme_mask"],
        pitch_target=batch["pitch"], energy_target=batch["energy"],
        duration_target=batch["duration"], train=True)["params"], seed=0)
    params = jax.tree.map(jnp.asarray, params)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    dim = cfg.filter_dim
    feats = jnp.asarray(rng.normal(size=(b, n, 4 * dim)), jnp.float32)
    frames_in = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), dtype)
    meldec = MelDecoder(cfg, dtype=dtype)
    md_params = host_init(lambda: meldec.init(
        jax.random.PRNGKey(1), frames_in)["params"], seed=1)
    md_params = jax.tree.map(jnp.asarray, md_params)

    def loss_fn(p, bt):
        pred = model.apply({"params": p}, bt["phoneme"],
                           bt["phoneme_mask"], pitch_target=bt["pitch"],
                           energy_target=bt["energy"],
                           duration_target=bt["duration"], train=True)
        return compute_losses(pred, bt)["loss"]

    def perturb(bt, s):
        return dict(bt, pitch=bt["pitch"] + s * 1e-6)

    cases = {}

    def add_case(name, fn):
        cases[name] = fn

    add_case("loss_fwd", lambda s: loss_fn(params, perturb(batch, s)))
    add_case("loss_grad", lambda s: jax.tree_util.tree_reduce(
        jnp.add, jax.tree.map(jnp.sum, jax.grad(loss_fn)(
            params, perturb(batch, s)))))

    def full_step(s):
        grads = jax.grad(loss_fn)(params, perturb(batch, s))
        updates, _ = tx.update(grads, opt_state, params)
        newp = optax.apply_updates(params, updates)
        return jax.tree_util.tree_reduce(
            jnp.add, jax.tree.map(jnp.sum, newp))

    add_case("full_step", full_step)

    def reg_fwd(s):
        f, v, l = length_regulate(feats + s * 1e-6, batch["duration"], m)
        return jnp.sum(f)

    add_case("reg_fwd", reg_fwd)
    add_case("reg_grad", lambda s: jnp.sum(
        jax.grad(lambda x: jnp.sum(length_regulate(
            x, batch["duration"], m)[0]))(feats + s * 1e-6)))
    add_case("regmm_fwd", lambda s: jnp.sum(one_hot_regulate(
        feats + s * 1e-6, batch["duration"], m)[0]))
    add_case("regmm_grad", lambda s: jnp.sum(
        jax.grad(lambda x: jnp.sum(one_hot_regulate(
            x, batch["duration"], m)[0]))(feats + s * 1e-6)))

    def meldec_fwd(s):
        return jnp.sum(meldec.apply({"params": md_params},
                                    frames_in + s * jnp.bfloat16(1e-3))
                       .astype(jnp.float32))

    add_case("meldec_fwd", meldec_fwd)
    add_case("meldec_grad", lambda s: jax.tree_util.tree_reduce(
        jnp.add, jax.tree.map(
            lambda g: jnp.sum(g.astype(jnp.float32)),
            jax.grad(lambda p: jnp.sum(meldec.apply(
                {"params": p}, frames_in + s * jnp.bfloat16(1e-3))
                .astype(jnp.float32)))(md_params))))

    # numerics: one-hot regulate == gather regulate
    f1 = length_regulate(feats, batch["duration"], m)[0]
    f2 = one_hot_regulate(feats, batch["duration"], m)[0]
    err = float(jnp.max(jnp.abs(f1 - f2)))
    print(f"one-hot vs gather regulator max|Δ| = {err:.2e}", flush=True)

    for name, fn in cases.items():
        def make(n_iters, fn=fn):
            @jax.jit
            def chain(seed):
                def body(i, c):
                    return c + fn(seed + i).astype(jnp.float32)
                return jax.lax.fori_loop(0, n_iters, body,
                                         jnp.float32(0.0))
            return chain
        t0 = time.time()
        try:
            ms = per_iter_ms(make(1), make(args.chain),
                             lambda k: (jnp.float32(k),),
                             args.chain, reps=args.reps)
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {name:12s} {ms:7.2f} ms   [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
