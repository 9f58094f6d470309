#!/usr/bin/env python3
"""Fifth bisection: remat at the full-loss level, and the projected full
train step with the remat'd mel decoder (flax nn.remat).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_bisect5.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from efficientspeech_tpu.config import ModelConfig
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
    args = parser.parse_args()

    enable_compilation_cache()
    b, n, m = args.batch, args.n_phoneme, args.n_mel
    dtype = jnp.bfloat16

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

    def cases_for(remat_decoder):
        cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)
        model = Phoneme2Mel(cfg, dtype=dtype,
                            remat_decoder=remat_decoder)
        params = host_init(lambda: model.init(
            jax.random.PRNGKey(0), batch["phoneme"],
            batch["phoneme_mask"], pitch_target=batch["pitch"],
            energy_target=batch["energy"],
            duration_target=batch["duration"], train=True)["params"],
            seed=0)
        params = jax.tree.map(jnp.asarray, params)
        tx = optax.adamw(1e-4)
        opt_state = tx.init(params)

        def loss_fn(p, bt):
            pred = model.apply({"params": p}, bt["phoneme"],
                               bt["phoneme_mask"],
                               pitch_target=bt["pitch"],
                               energy_target=bt["energy"],
                               duration_target=bt["duration"], train=True)
            return compute_losses(pred, bt)["loss"]

        def step(s):
            bt = dict(batch, pitch=batch["pitch"] + s * 1e-6)
            grads = jax.grad(loss_fn)(params, bt)
            updates, _ = tx.update(grads, opt_state, params)
            newp = optax.apply_updates(params, updates)
            return jax.tree_util.tree_reduce(
                jnp.add, jax.tree.map(
                    lambda a: jnp.sum(a.astype(jnp.float32)), newp))

        def step_full_remat(s):
            bt = dict(batch, pitch=batch["pitch"] + s * 1e-6)
            grads = jax.grad(jax.checkpoint(loss_fn))(params, bt)
            updates, _ = tx.update(grads, opt_state, params)
            newp = optax.apply_updates(params, updates)
            return jax.tree_util.tree_reduce(
                jnp.add, jax.tree.map(
                    lambda a: jnp.sum(a.astype(jnp.float32)), newp))

        return step, step_full_remat

    step_plain, step_plain_fullremat = cases_for(False)
    step_rematdec, _ = cases_for(True)
    cases = {
        "step_plain": step_plain,
        "step_loss_remat": step_plain_fullremat,
        "step_remat_decoder": step_rematdec,
    }

    for name, fn in cases.items():
        def make(n_iters, fn=fn):
            @jax.jit
            def chain(seed):
                def body(i, c):
                    return c + fn(seed + i)
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain

        t0 = time.time()
        try:
            ms = per_iter_ms(make(1), make(args.chain),
                             lambda kk: (jnp.float32(kk),),
                             args.chain, reps=args.reps)
        except Exception as e:
            print(f"  {name} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        print(f"  {name:20s} {ms:7.2f} ms  [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
