"""The jitted training/eval step.

One XLA program: forward (train-mode Phoneme2Mel), masked losses, backward,
AdamW update.  Data parallelism is expressed through shardings on the
arguments (batch split over the mesh 'data' axis, state replicated); XLA
emits the gradient all-reduce.  This replaces the reference's
Lightning training_step + DDP (reference: model.py:212-227).
"""

from typing import Dict, Tuple

import jax
import optax

from efficientspeech_tpu.models.phoneme2mel import Phoneme2Mel
from efficientspeech_tpu.training.losses import compute_losses
from efficientspeech_tpu.training.state import TrainState


def make_train_step(model: Phoneme2Mel, tx, mesh=None, donate: bool = True,
                    state_sharding=None):
    """Returns train_step(state, batch) -> (state, metrics), jitted.

    If ``mesh`` is given, shardings are attached: batch sharded over 'data',
    state replicated — or, when ``state_sharding`` is given (see
    parallel.sharding.state_shardings), tensor-parallel over 'model'.
    """

    def loss_fn(trainable, batch):
        pred = model.apply(
            {"params": trainable["phoneme2mel"]
             if "phoneme2mel" in trainable else trainable},
            batch["phoneme"], batch["phoneme_mask"],
            pitch_target=batch["pitch"],
            energy_target=batch["energy"],
            duration_target=batch["duration"],
            speaker=batch.get("speaker"),
            train=True)
        losses = compute_losses(pred, batch)
        return losses["loss"], losses

    def train_step(state: TrainState, batch: Dict) -> Tuple[TrainState, Dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, batch)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(step=state.step + 1, params=new_params,
                                  opt_state=new_opt_state)
        return new_state, metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        st = state_sharding if state_sharding is not None else repl
        return jax.jit(train_step,
                       in_shardings=(st, data),
                       out_shardings=(st, repl),
                       donate_argnums=(0,) if donate else ())
    return jax.jit(train_step, donate_argnums=(0,) if donate else ())


def make_eval_step(model: Phoneme2Mel, mesh=None):
    def eval_step(params, batch):
        pred = model.apply(
            {"params": params["phoneme2mel"]
             if "phoneme2mel" in params else params},
            batch["phoneme"], batch["phoneme_mask"],
            pitch_target=batch["pitch"],
            energy_target=batch["energy"],
            duration_target=batch["duration"],
            speaker=batch.get("speaker"),
            train=True)
        return compute_losses(pred, batch)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        return jax.jit(eval_step, in_shardings=(repl, data),
                       out_shardings=repl)
    return jax.jit(eval_step)
