#!/usr/bin/env python3
"""Second-level bisection of the mel-decoder backward (train_bisect.py
found it is ~11 of the 15.3 ms step at batch 128).

Times forward and forward+backward of each PRIMITIVE at the mel decoder's
(B=128, M=1152, C=128) shape: depthwise k=5 conv (shift-mul path),
pointwise conv, LayerNorm (f32 stats), tanh, and composed variants.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/train_bisect2.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.models.modules import LayerNorm
from efficientspeech_tpu.ops.conv import conv1d
from efficientspeech_tpu.utils.cache import enable_compilation_cache

from benchmarks._chain import per_iter_ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--n-mel", type=int, default=1152)
    parser.add_argument("--dim", type=int, default=128)
    parser.add_argument("--k", type=int, default=5)
    parser.add_argument("--chain", type=int, default=24)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--repeat", type=int, default=4,
                        help="apply each primitive this many times (the "
                             "decoder has 4 dw+pw pairs)")
    args = parser.parse_args()

    enable_compilation_cache()
    b, m, c, k, rep = args.batch, args.n_mel, args.dim, args.k, args.repeat
    dtype = jnp.bfloat16

    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(b, m, c)), dtype)
    dw_k = jnp.asarray(rng.normal(size=(rep, k, 1, c)) * 0.1, dtype)
    pw_k = jnp.asarray(rng.normal(size=(rep, 1, c, c)) * 0.1, dtype)
    ln = LayerNorm(dtype=dtype)
    ln_params = [ln.init(jax.random.PRNGKey(i), x0)["params"]
                 for i in range(rep)]
    ln_stack = jax.tree.map(lambda *xs: jnp.stack(xs), *ln_params)

    def dw_chain(x, w):
        for i in range(rep):
            x = conv1d(x, w[i], padding=k // 2, groups=c)
        return x

    def pw_chain(x, w):
        for i in range(rep):
            x = conv1d(x, w[i])
        return x

    def ln_chain(x, p):
        for i in range(rep):
            x = ln.apply({"params": jax.tree.map(lambda a: a[i], p)}, x)
        return x

    def tanh_chain(x, _):
        for i in range(rep):
            x = jnp.tanh(x)
        return x

    def block_chain(x, ws):
        dw, pw, p = ws
        for i in range(rep):
            x = conv1d(x, dw[i], padding=k // 2, groups=c)
            x = conv1d(x, pw[i])
            x = jnp.tanh(x)
            x = ln.apply({"params": jax.tree.map(lambda a: a[i], p)}, x)
        return x

    cases = {
        "dw": (dw_chain, dw_k),
        "pw": (pw_chain, pw_k),
        "ln": (ln_chain, ln_stack),
        "tanh": (tanh_chain, dw_k),
        "block": (block_chain, (dw_k, pw_k, ln_stack)),
    }

    for name, (fn, w) in cases.items():
        for grad in (False, True):
            if grad:
                def run(s, fn=fn, w=w):
                    g = jax.grad(lambda xx: jnp.sum(
                        fn(xx, w).astype(jnp.float32)))(
                            x0 + s.astype(dtype) * jnp.bfloat16(1e-3))
                    return jnp.sum(g.astype(jnp.float32))
            else:
                def run(s, fn=fn, w=w):
                    return jnp.sum(fn(
                        x0 + s.astype(dtype) * jnp.bfloat16(1e-3), w)
                        .astype(jnp.float32))

            def make(n_iters, run=run):
                @jax.jit
                def chain(seed):
                    def body(i, cacc):
                        return cacc + run(seed + i)
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
            print(f"  {label:12s} {ms:7.2f} ms  [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
