#!/usr/bin/env python3
"""Third-level bisection: the real MelDecoder's backward (11 ms) vs the
composed dw+pw+tanh+LN block chain (2.7 ms) — find the structural cost
(per-depth masked_fill? skip-norm residual structure? the f32 input
cast?).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_bisect3.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import ModelConfig
from efficientspeech_tpu.models.mel_decoder import MelDecoder
from efficientspeech_tpu.utils.cache import enable_compilation_cache
from efficientspeech_tpu.utils.host_init import host_init

from benchmarks._chain import per_iter_ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--n-mel", type=int, default=1152)
    parser.add_argument("--chain", type=int, default=24)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    enable_compilation_cache()
    b, m = args.batch, args.n_mel
    cfg = ModelConfig.preset("tiny", max_phoneme_len=128, max_mel_len=m)
    dim = cfg.filter_dim
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x_bf = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), dtype)
    x_f32 = x_bf.astype(jnp.float32)
    mask = jnp.zeros((b, m), bool).at[:, m - 64:].set(True)

    meldec = MelDecoder(cfg, dtype=dtype)
    params = host_init(lambda: meldec.init(
        jax.random.PRNGKey(1), x_bf)["params"], seed=1)
    params = jax.tree.map(jnp.asarray, params)

    cases = {
        # the real thing, exactly as the train step calls it
        "md_mask_f32in": lambda s: meldec.apply(
            {"params": params}, x_f32 + s * 1e-6, frame_pad_mask=mask),
        # no per-depth masking
        "md_nomask_f32": lambda s: meldec.apply(
            {"params": params}, x_f32 + s * 1e-6),
        # bf16 input (no implicit f32->bf16 cast chain)
        "md_mask_bf16": lambda s: meldec.apply(
            {"params": params},
            x_bf + s.astype(dtype) * jnp.bfloat16(1e-3),
            frame_pad_mask=mask),
        "md_nomask_bf16": lambda s: meldec.apply(
            {"params": params},
            x_bf + s.astype(dtype) * jnp.bfloat16(1e-3)),
    }

    for name, fn in cases.items():
        for grad in (False, True):
            if grad:
                def run(s, fn=fn):
                    g = jax.grad(lambda ss: jnp.sum(fn(ss)
                                                    .astype(jnp.float32)))(s)
                    return g
            else:
                def run(s, fn=fn):
                    return jnp.sum(fn(s).astype(jnp.float32))

            def make(n_iters, run=run):
                @jax.jit
                def chain(seed):
                    def body(i, c):
                        return c + run(seed + i)
                    return jax.lax.fori_loop(0, n_iters, body,
                                             jnp.float32(0.0))
                return chain

            label = name + ("_grad" if grad else "_fwd")
            t0 = time.time()
            try:
                ms = per_iter_ms(make(1), make(args.chain),
                                 lambda kk: (jnp.float32(kk),),
                                 args.chain, reps=args.reps)
            except Exception as e:
                print(f"  {label} FAILED: {type(e).__name__}: {e}",
                      flush=True)
                continue
            print(f"  {label:18s} {ms:7.2f} ms  [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
