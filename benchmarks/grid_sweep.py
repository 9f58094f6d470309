#!/usr/bin/env python3
"""Folded-vocoder GRID sweep on the real chip (round-3 VERDICT next #1).

The round-1/2 fold re-gridded every stage to D≈512 "near-ideal MXU
shapes" — but polyphase folding inflates FLOPs by ≈ (2w+1)·g/k per op, so
the d512 plan burns ~1.16 TFLOP of resblock matmuls where the raw convs
are ~0.14 TFLOP.  Minimizing taps·g per op shows the optimum is simply
the minimum-lane grid g = 128/C per stage (D=128 everywhere): ~2.9× fewer
FLOPs at still-fine GEMM shapes (N=128, K=taps·128, M=12k-49k rows).

This sweep chain-measures folded_plan_apply at the 3072-frame serving
shape for d_target ∈ {128, 256, 512} × {XLA, pallas tm...} on the real
chip, checking numerics between variants.

    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/grid_sweep.py
"""

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp

from efficientspeech_tpu.config import HifiGanConfig
from efficientspeech_tpu.models.hifigan import HifiGanGenerator
from efficientspeech_tpu.models.hifigan_folded import (
    fold_hifigan_device,
    folded_plan_apply,
)
from efficientspeech_tpu.utils.cache import enable_compilation_cache
from efficientspeech_tpu.utils.host_init import host_init

from benchmarks._chain import per_iter_ms


def plan_flops(arrays, frames: int, meta, cfg) -> float:
    """Total matmul FLOPs of one plan application at ``frames`` mel
    frames (rows per op = frames × valid_mult)."""
    total = 0.0
    for key, (W, b) in arrays.items():
        rows = frames * meta["valid_mult"][key]
        total += 2.0 * rows * W.shape[0] * W.shape[1]
    return total


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--frames", type=int, default=3072)
    parser.add_argument("--chain", type=int, default=8)
    parser.add_argument("--reps", type=int, default=5)
    parser.add_argument("--variants", default=(
        "512:pallas:512,128:xla:0,128:pallas:512,128:pallas:1024,"
        "256:pallas:512"),
        help="comma list of d_target:mode:tm; modes: xla, pallas "
             "(round-3 baseline: f32 activations, unfused stage sum), "
             "pallasacc (stage-sum+scale fused into kernel epilogues), "
             "pallasb16 (bf16 inter-op activations), pallasaccb16 "
             "(both), pallasfk, pallaswd")
    args = parser.parse_args()

    enable_compilation_cache()
    cfg = HifiGanConfig()
    gen = HifiGanGenerator(cfg, dtype=jnp.float32)
    params = host_init(lambda: gen.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 4, 80)))["params"], seed=1)

    t = args.frames
    rng = np.random.default_rng(0)
    mel_np = rng.normal(-3, 2, size=(1, t, 80)).astype(np.float32)
    valid = int(t * 0.95)
    mel_np[0, valid:] = 0
    mel = jnp.asarray(mel_np)
    vl = jnp.asarray([valid])

    results = {}
    outputs = {}
    for spec in args.variants.split(","):
        dt_s, mode, tm_s = spec.split(":")
        dt, tm = int(dt_s), int(tm_s)
        arrays, meta = fold_hifigan_device(params, cfg, dtype=jnp.bfloat16,
                                           d_target=dt)
        gflop = plan_flops(arrays, t, meta, cfg) / 1e9
        use_pallas = mode.startswith("pallas")
        fuse_k = mode == "pallasfk"
        win_dma = mode == "pallaswd"
        fuse_sum = "acc" in mode
        fuse_mrf = "mrf" in mode
        act_dtype = jnp.bfloat16 if mode.endswith("b16") else None

        def make(n_iters, arrays=arrays, meta=meta, use_pallas=use_pallas,
                 tm=tm, fuse_k=fuse_k, win_dma=win_dma, fuse_sum=fuse_sum,
                 act_dtype=act_dtype, fuse_mrf=fuse_mrf):
            @jax.jit
            def chain(mel, vl, seed):
                def body(i, c):
                    m = mel.at[0, 0, 0].set(seed + i * 0.1)
                    wav = folded_plan_apply(
                        arrays, meta, cfg, m, valid_len=vl,
                        dtype=jnp.bfloat16, use_pallas=use_pallas,
                        pallas_tm=tm if tm else 512,
                        pallas_fuse_k=fuse_k, pallas_window_dma=win_dma,
                        fuse_stage_sum=fuse_sum, act_dtype=act_dtype,
                        fuse_mrf=fuse_mrf, mrf_tm=tm if tm else 512)
                    return c + wav[0, 0] + wav[0, -1]
                return jax.lax.fori_loop(0, n_iters, body, jnp.float32(0.0))
            return chain

        label = f"d{dt}:{mode}" + (f":tm{tm}" if use_pallas else "")
        print(f"compiling {label} (GFLOP/apply {gflop:.1f}) ...",
              flush=True)
        t0 = time.time()
        try:
            ms = per_iter_ms(make(1), make(args.chain),
                             lambda k: (mel, vl, jnp.float32(k)),
                             args.chain, reps=args.reps)
        except Exception as e:
            print(f"  {label} FAILED: {type(e).__name__}: {e}", flush=True)
            continue
        results[label] = (ms, gflop)
        # one numerics probe per variant (same seeded perturbation)
        single = jax.jit(lambda m, v, arrays=arrays, meta=meta,
                         use_pallas=use_pallas, tm=tm, fuse_k=fuse_k,
                         win_dma=win_dma, fuse_sum=fuse_sum,
                         act_dtype=act_dtype, fuse_mrf=fuse_mrf:
                         folded_plan_apply(
                             arrays, meta, cfg, m, valid_len=v,
                             dtype=jnp.bfloat16, use_pallas=use_pallas,
                             pallas_tm=tm if tm else 512,
                             pallas_fuse_k=fuse_k,
                             pallas_window_dma=win_dma,
                             fuse_stage_sum=fuse_sum,
                             act_dtype=act_dtype,
                             fuse_mrf=fuse_mrf, mrf_tm=tm if tm else 512))
        outputs[label] = np.asarray(jax.device_get(single(mel, vl)))
        eff = gflop / ms * 1e3 / 1e3  # TFLOP/s
        print(f"  {label}: {ms:.2f} ms  ({gflop:.0f} GFLOP, "
              f"{eff:.1f} TFLOP/s eff)  [{time.time()-t0:.0f}s incl "
              f"compile]", flush=True)

    keys = list(outputs)
    for k in keys[1:]:
        d = np.abs(outputs[k] - outputs[keys[0]])
        print(f"numerics {k} vs {keys[0]}: max|Δ| {d.max():.3e} "
              f"rms {np.sqrt((d**2).mean()):.3e}")
    print("\nsummary:")
    for label, (ms, gflop) in sorted(results.items(), key=lambda x: x[1][0]):
        print(f"  {label:24s} {ms:7.2f} ms   {gflop:6.0f} GFLOP")


if __name__ == "__main__":
    main()
