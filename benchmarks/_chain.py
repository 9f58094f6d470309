"""Shared RTT-amortized device timing for the tunneled chip.

On the axon relay ``jax.block_until_ready`` does not reliably block and
identical-argument re-dispatches can return in ~0.1 ms (CLAUDE.md), so
every benchmark here times an ON-DEVICE chain of N dependent iterations
(built by the caller as a ``lax.fori_loop`` whose carry perturbs the
input, defeating CSE) with a ``device_get`` barrier and a VARYING seed
argument per call:

    per_iter_ms = (wall(chain_N) - wall(chain_1)) / (N - 1)
"""

import time

import numpy as np


def chain_time(fn_one, fn_chain, args_fn, reps: int = 7):
    """Median wall times (t1, tN) of the 1-iteration and N-iteration
    chains.  ``args_fn(k)`` must return the call args with a per-call
    varying seed; both functions are warmed once first."""
    import jax

    jax.device_get(fn_one(*args_fn(0)))
    jax.device_get(fn_chain(*args_fn(0)))
    t1s, tNs = [], []
    for k in range(reps):
        t0 = time.time()
        jax.device_get(fn_one(*args_fn(k + 1)))
        t1s.append(time.time() - t0)
        t0 = time.time()
        jax.device_get(fn_chain(*args_fn(k + 1)))
        tNs.append(time.time() - t0)
    return float(np.median(t1s)), float(np.median(tNs))


def per_iter_ms(fn_one, fn_chain, args_fn, n_iters: int, reps: int = 7):
    """Per-iteration device milliseconds via the chain method."""
    t1, tN = chain_time(fn_one, fn_chain, args_fn, reps)
    return (tN - t1) / (n_iters - 1) * 1e3
