#!/usr/bin/env python3
"""Eighth bisection: the fused decoder-block Pallas kernel
(ops/pallas/decoder_block.py) vs the fused-LN-only decoder, and the full
train step with it.

Context (train_bisect7, batch 128): meldec_fwd 1.95 ms / meldec_grad
9.05 ms with fused LN — the decoder backward is still ~70% of the
12.7 ms step.  The fused block collapses each depth iteration
(masked_fill + dw + pw + tanh + LN fwd AND bwd) to one kernel each way.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_bisect8.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.mel_decoder import MelDecoder
from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
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
    parser.add_argument("--tg", type=int, default=4)
    parser.add_argument("--tg-bwd", type=int, default=2)
    parser.add_argument("--bwd-vmem-mb", type=int, default=0,
                        help="raise Mosaic's scoped-vmem cap for the "
                             "backward kernel (0 = default 16 MB)")
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

    meldec = MelDecoder(cfg, dtype=dtype, fused_norm=True, fused_block=True,
                        fused_block_tg=args.tg,
                        fused_block_tg_bwd=args.tg_bwd,
                        fused_block_bwd_vmem_mb=args.bwd_vmem_mb)
    md_params = host_init(lambda: meldec.init(
        jax.random.PRNGKey(1), frames_in, frame_mask)["params"], seed=1)
    md_params = jax.tree.map(jnp.asarray, md_params)

    def meldec_fwd(s):
        return jnp.sum(meldec.apply(
            {"params": md_params}, frames_in + s * jnp.bfloat16(1e-3),
            frame_mask).astype(jnp.float32))

    cases["meldec_fb_fwd"] = meldec_fwd
    cases["meldec_fb_grad"] = lambda s: jax.tree_util.tree_reduce(
        jnp.add, jax.tree.map(
            lambda g: jnp.sum(g.astype(jnp.float32)),
            jax.grad(lambda p: jnp.sum(meldec.apply(
                {"params": p}, frames_in + s * jnp.bfloat16(1e-3),
                frame_mask).astype(jnp.float32)))(md_params)))

    model = Phoneme2Mel(cfg, dtype=dtype, fused_decoder_norm=True,
                        fused_decoder_block=True,
                        fused_block_tg_bwd=args.tg_bwd,
                        fused_block_bwd_vmem_mb=args.bwd_vmem_mb)
    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), batch["phoneme"], batch["phoneme_mask"],
        pitch_target=batch["pitch"], energy_target=batch["energy"],
        duration_target=batch["duration"], train=True)["params"], seed=0)
    params = jax.tree.map(jnp.asarray, params)
    tx = optax.adamw(1e-4)
    opt_state = tx.init(params)

    def loss_fn(p, bt):
        pred = model.apply({"params": p}, bt["phoneme"],
                           bt["phoneme_mask"], pitch_target=bt["pitch"],
                           energy_target=bt["energy"],
                           duration_target=bt["duration"], train=True)
        return compute_losses(pred, bt)["loss"]

    def full_step(s):
        bt = dict(batch, pitch=batch["pitch"] + s * 1e-6)
        grads = jax.grad(loss_fn)(params, bt)
        updates, _ = tx.update(grads, opt_state, params)
        newp = optax.apply_updates(params, updates)
        return jax.tree_util.tree_reduce(
            jnp.add, jax.tree.map(
                lambda a: jnp.sum(a.astype(jnp.float32)), newp))

    cases["step_fusedblock"] = full_step

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
        print(f"  {name:16s} {ms:7.2f} ms   [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
