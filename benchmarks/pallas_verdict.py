#!/usr/bin/env python3
"""Pallas folded-matmul kernel vs XLA folded matmuls — the verdict run
(VERDICT round 1, item 8).

Measures DEVICE time of the full folded HiFi-GAN generator at small→large
frame counts by chaining N dependent applications inside ONE jitted program
(a lax.fori_loop whose carry perturbs the input, defeating CSE), so the
~30 ms tunnel round trip amortizes away:

    kernel_time ≈ (wall(chain_N) - wall(chain_1)) / (N - 1)

Run on the real chip:  python benchmarks/pallas_verdict.py
"""

import argparse
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sizes", default="256,1024,2048")
    parser.add_argument("--chain", type=int, default=16)
    parser.add_argument("--reps", type=int, default=9)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from efficientspeech_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from efficientspeech_tpu.infer import build_synthesizer
    from efficientspeech_tpu.models.hifigan_folded import folded_plan_apply

    synth = build_synthesizer(
        preset="tiny",
        hifigan_checkpoint="/root/reference/hifigan/LJ_V2/generator_v2",
        dtype=jnp.bfloat16, bench_duration_bias=6.0)
    synth._ensure_folded()
    arrays, meta = synth._folded_params
    cfg = synth.hifigan_cfg
    dtype = synth.dtype

    # NOTE: on the axon relay, jax.block_until_ready does NOT reliably block
    # and identical-argument calls can return in ~0.1 ms; timings here use
    # device_get + a varying ``seed`` argument to force real execution.
    def make_chain(use_pallas: bool, n_iters: int, T: int):
        @jax.jit
        def chain(arrs, mel, mel_len, seed):
            def body(i, c):
                wav = folded_plan_apply(
                    arrs, meta, cfg, mel + (c + seed) * 1e-6,
                    valid_len=mel_len,
                    dtype=dtype, use_pallas=use_pallas)
                return c * 0.5 + wav[0, 0].astype(jnp.float32)

            return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))

        return chain

    rng = np.random.default_rng(0)
    print(f"device: {jax.devices()[0]}  chain={args.chain}", flush=True)
    print(f"{'T':>6} {'xla ms':>9} {'pallas ms':>10} {'speedup':>8}",
          flush=True)

    for T in [int(s) for s in args.sizes.split(",")]:
        mel = jnp.asarray(rng.normal(size=(1, T, 80)) * 2 - 6, dtype)
        mel_len = jnp.asarray([T], jnp.int32)
        row = {}
        for name, up in (("xla", False), ("pallas", True)):
            try:
                c1 = make_chain(up, 1, T)
                cN = make_chain(up, args.chain, T)
                jax.device_get(c1(arrays, mel, mel_len, 0.0))
                jax.device_get(cN(arrays, mel, mel_len, 0.0))
                t1s, tNs = [], []
                for k in range(args.reps):
                    t0 = time.time()
                    jax.device_get(c1(arrays, mel, mel_len, float(k + 1)))
                    t1s.append(time.time() - t0)
                    t0 = time.time()
                    jax.device_get(cN(arrays, mel, mel_len, float(k + 1)))
                    tNs.append(time.time() - t0)
                ms = (np.median(tNs) - np.median(t1s)) \
                    / (args.chain - 1) * 1e3
                row[name] = ms
            except Exception as e:
                print(f"  {name}@{T} failed: {str(e)[:200]}", flush=True)
                row[name] = float("nan")
        sp = row.get("xla", np.nan) / row.get("pallas", np.nan)
        print(f"{T:>6} {row.get('xla', float('nan')):>9.3f} "
              f"{row.get('pallas', float('nan')):>10.3f} {sp:>8.2f}x",
              flush=True)


if __name__ == "__main__":
    main()
