"""Diagnose the folded_matmul compiled-vs-oracle mismatch seen by
tests/test_tpu_smoke.py::test_folded_matmul_compiled (t=1024, tm=512,
d=128, w=1): which rows differ, and is it a shift?"""

import numpy as np

from efficientspeech_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax
import jax.numpy as jnp

from efficientspeech_tpu.ops.pallas.folded_matmul import folded_matmul


def oracle(x, W, b, w, valid, pre_lrelu=True):
    t = x.shape[0]
    xl = np.where(x >= 0, x, x * 0.1) if pre_lrelu else x
    xp = np.pad(xl, ((w, w), (0, 0)))
    window = np.concatenate([xp[i: i + t] for i in range(2 * w + 1)], -1)
    y = window @ W + b
    y[valid:] = 0.0
    return y


def probe(t, d_in, d_out, w, valid, tm):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((t, d_in)).astype(np.float32)
    W = (rng.standard_normal(((2 * w + 1) * d_in, d_out)) * 0.05
         ).astype(np.float32)
    b = rng.standard_normal((d_out,)).astype(np.float32)

    got = np.asarray(jax.device_get(jax.jit(
        lambda x: folded_matmul(jnp.asarray(x), jnp.asarray(W),
                                jnp.asarray(b), w, jnp.int32(valid),
                                pre_lrelu=True, tm=tm))(x)))
    want = oracle(x, W, b, w, valid)
    d = np.abs(got - want).max(axis=1)
    bad = np.nonzero(d > 5e-4)[0]
    print(f"t={t} tm={tm} d={d_in}->{d_out} w={w} valid={valid}: "
          f"{len(bad)} bad rows", flush=True)
    if len(bad):
        print(f"  bad rows: {bad[:10]}...{bad[-5:]} max|d| {d.max():.3e}")
        # shift probe: does got[r] match want[r+s]?
        for s in (-2, -1, 1, 2):
            lo, hi = max(0, -s), min(t, t - s)
            dd = np.abs(got[lo:hi] - want[lo + s:hi + s]).max()
            print(f"  shift {s:+d}: max|got[r]-want[r+{s}]| = {dd:.3e}")


if __name__ == "__main__":
    probe(1024, 128, 128, 1, 1000, 512)   # the failing smoke shape
    probe(1024, 128, 128, 1, 1000, 256)
    probe(512, 128, 128, 1, 512, 512)
    probe(3072, 128, 128, 1, 3000, 512)   # serving-like shape
