"""Orbax checkpointing: save/restore params + optimizer state + step.

Replaces the reference's Lightning-default .ckpt files
(reference: model.py:125 save_hyperparameters + lightning_logs/...).
Deterministic resume: the data-order RNG seed is derived from the step so a
restored run repeats the same shuffle sequence.
"""

import json
import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(ckpt_dir: str, state, step: Optional[int] = None,
                    metadata: Optional[dict] = None):
    ckpt_dir = _abs(ckpt_dir)
    os.makedirs(ckpt_dir, exist_ok=True)
    step = int(step if step is not None else jax.device_get(state.step))
    path = os.path.join(ckpt_dir, f"step_{step:08d}")
    ckptr = ocp.StandardCheckpointer()
    payload = {"params": jax.device_get(state.params),
               "opt_state": jax.device_get(state.opt_state),
               "step": step}
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    if metadata is not None:
        with open(os.path.join(ckpt_dir, "metadata.json"), "w") as f:
            json.dump(metadata, f, indent=2)
    return path


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpt_dir = _abs(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    steps = sorted(d for d in os.listdir(ckpt_dir) if d.startswith("step_"))
    return os.path.join(ckpt_dir, steps[-1]) if steps else None


def restore_checkpoint(path: str, target_state):
    """Restore into the structure of ``target_state`` (params+opt_state+step)."""
    ckptr = ocp.StandardCheckpointer()
    template = {"params": jax.device_get(target_state.params),
                "opt_state": jax.device_get(target_state.opt_state),
                "step": 0}
    payload = ckptr.restore(_abs(path), template)
    return target_state.replace(
        step=np.int32(payload["step"]),
        params=payload["params"],
        opt_state=payload["opt_state"])


def save_params(ckpt_dir: str, params):
    """Standalone inference-params checkpoint (incl. frozen vocoder)."""
    ckpt_dir = _abs(ckpt_dir)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(ckpt_dir, jax.device_get(params), force=True)
    ckptr.wait_until_finished()


def restore_params(ckpt_dir: str):
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(_abs(ckpt_dir))
