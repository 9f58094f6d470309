"""Linear-warmup + cosine-decay LR schedule (reference: model.py:77-101).

The reference steps its LambdaLR once per EPOCH (Lightning default); we map
epochs → steps so per-step optax scheduling reproduces the same curve.
"""

import math

import optax


def warmup_cosine_schedule(base_lr: float, warmup_epochs: int,
                           total_epochs: int, steps_per_epoch: int,
                           min_lr: float = 0.0) -> optax.Schedule:
    def schedule(step):
        import jax.numpy as jnp

        epoch = step / steps_per_epoch
        warm = epoch / max(1, warmup_epochs)
        progress = (epoch - warmup_epochs) / max(1, total_epochs - warmup_epochs)
        cos = jnp.maximum(min_lr, 0.5 * (1.0 + jnp.cos(math.pi * progress)))
        return base_lr * jnp.where(epoch < warmup_epochs, warm, cos)

    return schedule
