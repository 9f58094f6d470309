"""Host-side parameter initialization via jax.eval_shape.

Flax ``model.init`` executes on-device (op-by-op if unjitted, or as a
compiled program if jitted) — either way minutes over a tunneled TPU.  For
random-weight use (benchmarks, compile checks) we only need correctly-shaped
values with sane scales: eval_shape traces shapes with ZERO device work and
numpy materializes torch-style values (LayerNorm scale=1/bias=0, embeddings
N(0,1), kernels uniform ±1/√fan_in).
"""

import jax
import numpy as np


def host_init(init_thunk, seed: int = 0):
    """init_thunk: () -> params pytree (called only under eval_shape)."""
    shapes = jax.eval_shape(init_thunk)
    host_rng = np.random.default_rng(seed)

    def materialize(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        shape, dtype = leaf.shape, leaf.dtype
        if name == "scale":
            return np.ones(shape, dtype)
        if name == "bias":
            return np.zeros(shape, dtype)
        if name == "embedding":
            return host_rng.normal(0, 1, shape).astype(dtype)
        fan_in = (shape[0] if len(shape) == 2
                  else int(np.prod(shape[:-1])) if len(shape) >= 2
                  else max(shape[0], 1))
        bound = 1.0 / np.sqrt(max(fan_in, 1))
        return host_rng.uniform(-bound, bound, shape).astype(dtype)

    return jax.tree_util.tree_map_with_path(materialize, shapes)
