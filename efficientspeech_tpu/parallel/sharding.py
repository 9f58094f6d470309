"""Parameter sharding rules for the ('data', 'model') mesh.

The reference has no tensor parallelism (266k-4M params need none;
reference: train.py:66-70 is pure DDP), but the mesh keeps a ``model`` axis
so larger variants can shard without re-plumbing.  These rules express the
classic column/row-parallel pattern on the transformer blocks via GSPMD:
annotate parameter shardings, let XLA partition the matmuls and insert the
collectives.

Applied pairs (per encoder stage):
  attention qkv kernel   (in, 3*H*dim)  → column-parallel P(None, 'model')
  attention proj kernel  (H*dim, dim)   → row-parallel    P('model', None)
  mixffn mlp1 kernel     (dim, hidden)  → column-parallel
  mixffn mlp2 kernel     (hidden, dim)  → row-parallel
Everything else replicates.  Correctness (== replicated numerics) is
asserted by tests/test_tensor_parallel.py on a virtual mesh.
"""

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

TP_RULES = [
    (re.compile(r".*/attn/qkv/kernel$"), P(None, "model")),
    (re.compile(r".*/attn/proj/kernel$"), P("model", None)),
    (re.compile(r".*/mixffn/mlp1/kernel$"), P(None, "model")),
    (re.compile(r".*/mixffn/mlp2/kernel$"), P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        parts.append(p.key if hasattr(p, "key") else str(p))
    return "/".join(parts)


def tp_param_shardings(params: Any, mesh: Mesh):
    """Pytree of NamedShardings: TP rules where divisible, replicated else."""
    model_size = mesh.shape.get("model", 1)

    def assign(path, leaf):
        name = _path_str(path)
        if model_size > 1:
            for rx, spec in TP_RULES:
                if rx.match(name):
                    # shard only when the dimension divides evenly
                    dim = 0 if spec[0] == "model" else 1
                    if leaf.shape[dim] % model_size == 0:
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def state_shardings(state, mesh: Mesh):
    """TrainState shardings: params and their AdamW moments follow the TP
    rules; counts/scalars replicate."""
    param_sh = tp_param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())

    params_struct = jax.tree_util.tree_structure(state.params)

    def match_opt(opt_state):
        out = []
        for part in opt_state:
            if (hasattr(part, "mu")  # optax ScaleByAdamState
                    and jax.tree_util.tree_structure(part.mu)
                    == params_struct):
                out.append(part._replace(mu=param_sh, nu=param_sh,
                                         count=repl))
            else:
                # flat_wrap'd optimizer (training/state.py): moments are a
                # single flattened vector — replicate them
                out.append(jax.tree.map(lambda _: repl, part))
        return tuple(out)

    return state.replace(
        step=repl,
        params=param_sh,
        opt_state=match_opt(state.opt_state),
        frozen=None if state.frozen is None
        else jax.tree.map(lambda _: repl, state.frozen))
