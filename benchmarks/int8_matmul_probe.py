#!/usr/bin/env python3
"""Probe: is int8 MXU matmul actually 2x bf16 on this v5e?

Decides whether an int8 folded-vocoder serving path is worth building
(v5e spec: 394 int8 TOPS vs 197 bf16 TFLOPS).  Chain-times XLA dots at
the folded-vocoder d128 serving shape and a fat shape, int8 (int32
accum) vs bf16 (f32 accum).

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/int8_matmul_probe.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.utils.cache import enable_compilation_cache
from benchmarks._chain import per_iter_ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--chain", type=int, default=32)
    parser.add_argument("--reps", type=int, default=5)
    args = parser.parse_args()

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # (M, K, N): d128 resblock op shape (5-tap window) and a fat control
    shapes = [(49152, 640, 128), (8192, 2048, 2048)]
    for m, k, n in shapes:
        xi = jnp.asarray(rng.integers(-127, 127, size=(m, k)), jnp.int8)
        wi = jnp.asarray(rng.integers(-127, 127, size=(k, n)), jnp.int8)
        xb = jnp.asarray(rng.normal(size=(m, k)), jnp.bfloat16)
        wb = jnp.asarray(rng.normal(size=(k, n)), jnp.bfloat16)

        def make_i8(n_iters):
            @jax.jit
            def chain(x, w, seed):
                def body(i, c):
                    xx = x.at[0, 0].set((seed + i).astype(jnp.int8))
                    y = jax.lax.dot_general(
                        xx, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)
                    return c + y[0, 0] + y[-1, -1]
                return jax.lax.fori_loop(0, n_iters, body, jnp.int32(0))
            return chain

        def make_bf(n_iters):
            @jax.jit
            def chain(x, w, seed):
                def body(i, c):
                    xx = x.at[0, 0].set(seed + i)
                    y = jax.lax.dot_general(
                        xx, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    return c + y[0, 0] + y[-1, -1]
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain

        gflop = 2.0 * m * k * n / 1e9
        for name, mk, xa, wa, seed in [
            ("bf16", make_bf, xb, wb, lambda s: jnp.bfloat16(s)),
            ("int8", make_i8, xi, wi, lambda s: jnp.int32(s)),
        ]:
            t0 = time.time()
            try:
                ms = per_iter_ms(mk(1), mk(args.chain),
                                 lambda s, xa=xa, wa=wa, seed=seed:
                                 (xa, wa, seed(s)),
                                 args.chain, reps=args.reps)
            except Exception as e:
                print(f"  ({m},{k},{n}) {name} FAILED: "
                      f"{type(e).__name__}: {e}", flush=True)
                continue
            print(f"  ({m},{k},{n}) {name}: {ms:.3f} ms  "
                  f"{gflop/ms:.0f} G(FL)OP/ms  [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
