#!/usr/bin/env python3
"""Where do the 14.5 ms of a device-data training step go?

Chain-times (RTT-amortized fori_loop, varying seed, device_get barrier —
the pallas_verdict.py method) the pieces of the cached train step at the
scale-run shape (batch 128, 128 phonemes, 1024 mel frames):

  gather   device gather of the batch rows from the HBM cache
  fwd      loss forward (teacher-forced) only
  step     full gather + forward + backward + AdamW update

and sweeps batch size to show the compute scaling.

Run on the real chip:  python benchmarks/train_sweep.py
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chain", type=int, default=8)
    parser.add_argument("--reps", type=int, default=7)
    parser.add_argument("--batches", default="32,128,256")
    parser.add_argument("--precision", default="bf16")
    parser.add_argument("--corpus-size", type=int, default=512)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.config import ModelConfig, TrainConfig
    from efficientspeech_tpu.data.device_cache import (
        _make_step_body, gather_batch, upload_cache)
    from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
    from efficientspeech_tpu.training.losses import compute_losses
    from efficientspeech_tpu.training.state import (
        create_train_state, make_optimizer)
    from efficientspeech_tpu.utils.host_init import host_init
    from benchmarks.train_bench import synth_samples

    n, m = 128, 1024
    cfg = ModelConfig.preset("tiny", max_phoneme_len=n, max_mel_len=m)
    dtype = jnp.bfloat16 if args.precision == "bf16" else jnp.float32
    model = Phoneme2Mel(cfg, dtype=dtype,
                        fused_decoder_norm=jax.default_backend() != "cpu")
    rng = np.random.default_rng(0)
    host_cache = synth_samples(rng, args.corpus_size, n, m)
    dev_cache = upload_cache(host_cache)

    params = host_init(lambda: model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, n), jnp.int32),
        jnp.ones((1, n), bool), pitch_target=jnp.zeros((1, n)),
        energy_target=jnp.zeros((1, n)),
        duration_target=jnp.ones((1, n), jnp.int32), train=True)["params"])
    train_cfg = TrainConfig(batch_size=128)
    tx = make_optimizer(train_cfg, 100)
    state = create_train_state({"phoneme2mel": params}, train_cfg, 100)
    state = jax.device_put(state)
    step_body = _make_step_body(model, tx)

    from benchmarks._chain import per_iter_ms

    def chain_time(make, argf):
        return per_iter_ms(make(1), make(args.chain), argf, args.chain,
                           args.reps)

    s = args.corpus_size
    print(f"device: {jax.devices()[0]}  chain={args.chain}  "
          f"{args.precision}", flush=True)
    for b in [int(x) for x in args.batches.split(",")]:
        idx0 = jnp.asarray(rng.integers(0, s, size=b).astype(np.int32))

        def mk_gather(n_iters):
            @jax.jit
            def chain(cache, idx, seed):
                def body(i, c):
                    batch = gather_batch(cache, (idx + i + seed) % s)
                    return c + batch["mel"][0, 0, 0] + batch["pitch"][0, 0]
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain

        def mk_fwd(n_iters):
            @jax.jit
            def chain(p, cache, idx, seed):
                def body(i, c):
                    batch = gather_batch(cache, (idx + i + seed) % s)
                    pred = model.apply(
                        {"params": p["phoneme2mel"]},
                        batch["phoneme"], batch["phoneme_mask"],
                        pitch_target=batch["pitch"],
                        energy_target=batch["energy"],
                        duration_target=batch["duration"],
                        speaker=batch.get("speaker"), train=True)
                    return c + compute_losses(pred, batch)["loss"]
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain

        def mk_step(n_iters):
            @jax.jit
            def chain(st, cache, idx, seed):
                def body(i, carry):
                    st = carry
                    st, metrics = step_body(st, cache, (idx + i + seed) % s)
                    return st
                st = jax.lax.fori_loop(0, n_iters, body, st)
                # return a param leaf so the update chain can't be DCE'd
                leaf = jax.tree.leaves(st.params)[0]
                return st.step + leaf.reshape(-1)[0].astype(jnp.float32)

            return chain

        tg = chain_time(mk_gather, lambda k: (dev_cache, idx0, k))
        tf = chain_time(mk_fwd, lambda k: (state.params, dev_cache, idx0, k))
        ts = chain_time(mk_step, lambda k: (state, dev_cache, idx0, k))
        print(f"batch {b:>4}: gather {tg:6.2f}  fwd {tf:6.2f}  "
              f"full step {ts:6.2f} ms "
              f"({1e3 / ts:.0f} steps/s)", flush=True)


if __name__ == "__main__":
    main()
