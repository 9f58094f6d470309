"""Device mesh + sharding for distributed training.

The reference delegates multi-device training wholesale to Lightning DDP
over NCCL (reference: train.py:66-70, model.py:237-242).  The TPU-native
replacement is ~50 lines: a ``jax.sharding.Mesh`` with a ``data`` axis (and
a ``model`` axis stub for generality), batches sharded on their leading
dimension, parameters replicated, and XLA inserting the gradient
all-reduces (psum over ICI) automatically under ``jit``.

Scaling story: a 2-D ('data', 'model') mesh is constructed even when
model_parallel=1, so tensor-parallel shardings can be introduced per-layer
later without re-plumbing; multi-slice DCN meshes come free from the same
API.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data_parallel: Optional[int] = None,
              model_parallel: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    assert data_parallel * model_parallel <= n, (
        f"mesh {data_parallel}x{model_parallel} exceeds {n} devices")
    grid = np.asarray(devices[: data_parallel * model_parallel]).reshape(
        data_parallel, model_parallel)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Host numpy batch → device arrays sharded batch-dim over 'data'."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
