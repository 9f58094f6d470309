#!/usr/bin/env python3
"""Fourth bisection: does remat (jax.checkpoint) fix the mel-decoder
backward?  The 8.6 ms grad at ~0.2 ms of FLOPs smells like saved-f32
activation traffic; remat trades recompute (2.9 ms fwd) for traffic.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_bisect4.py
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
    x_f32 = jnp.asarray(rng.normal(size=(b, m, 4 * dim)), jnp.float32)
    mask = jnp.zeros((b, m), bool).at[:, m - 64:].set(True)

    meldec = MelDecoder(cfg, dtype=dtype)
    params = host_init(lambda: meldec.init(
        jax.random.PRNGKey(1), x_f32.astype(dtype))["params"], seed=1)
    params = jax.tree.map(jnp.asarray, params)

    def apply_plain(p, x):
        return meldec.apply({"params": p}, x, frame_pad_mask=mask)

    apply_remat = jax.checkpoint(apply_plain)
    # dots saveable: recompute everything EXCEPT matmul outputs
    apply_remat_dots = jax.checkpoint(
        apply_plain, policy=jax.checkpoint_policies.checkpoint_dots)

    cases = {
        "md_grad_x": ("plain, grad wrt input", apply_plain, False),
        "md_grad_xp": ("plain, grad wrt input+params", apply_plain, True),
        "md_remat_xp": ("full remat", apply_remat, True),
        "md_rematdots_xp": ("remat save-dots", apply_remat_dots, True),
    }

    for name, (desc, fn, wrt_params) in cases.items():
        def run(s, fn=fn, wrt_params=wrt_params):
            if wrt_params:
                g = jax.grad(lambda p, xx: jnp.sum(
                    fn(p, xx).astype(jnp.float32)), argnums=(0, 1))(
                        params, x_f32 + s * 1e-6)
                return (jnp.sum(g[1]) + jax.tree_util.tree_reduce(
                    jnp.add, jax.tree.map(
                        lambda a: jnp.sum(a.astype(jnp.float32)), g[0])))
            return jnp.sum(jax.grad(lambda xx: jnp.sum(
                fn(params, xx).astype(jnp.float32)))(x_f32 + s * 1e-6))

        def make(n_iters, run=run):
            @jax.jit
            def chain(seed):
                def body(i, c):
                    return c + run(seed + i)
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
        print(f"  {name:18s} {ms:7.2f} ms  ({desc})  [{time.time()-t0:.0f}s]",
              flush=True)


if __name__ == "__main__":
    main()
