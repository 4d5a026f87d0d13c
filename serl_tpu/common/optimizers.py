"""Optimizer factory, composed from optax primitives.

Capability parity with `serl_launcher/common/optimizers.py:6-56` (warmup +
optional cosine decay, optional grad-norm clip, adam/adamw, loggable
learning rate), re-expressed as an explicit primitive chain: clip ->
scale_by_adam -> decayed weights -> loggable schedule scale. `optax.adam(lr)`
IS `chain(scale_by_adam(), scale_by_learning_rate(lr))` and `adamw`
additionally inserts `add_decayed_weights`, so the math is identical to the
reference's factory; only the final scale step carries inject_hyperparams,
which is what makes the current lr readable from the optimizer state
(`optimizer_lr`, logged per group at sac.py update()).
"""

from typing import Optional

import jax.numpy as jnp
import optax


def _lr_schedule(learning_rate, warmup_steps, cosine_decay_steps):
    if cosine_decay_steps is not None:
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=cosine_decay_steps,
            end_value=0.0,
        )
    if warmup_steps > 0:
        # linear ramp 0 -> lr over warmup_steps, constant after
        def ramp(count):
            frac = jnp.minimum(count / warmup_steps, 1.0)
            return learning_rate * frac

        return ramp
    return lambda count: learning_rate


def _scale_by_loggable_schedule(schedule):
    """Final descent step with the lr exposed in the optimizer state."""

    @optax.inject_hyperparams
    def scale(learning_rate):
        return optax.scale(-learning_rate)

    return scale(learning_rate=schedule)


def make_optimizer(
    learning_rate: float = 3e-4,
    warmup_steps: int = 0,
    cosine_decay_steps: Optional[int] = None,
    weight_decay: Optional[float] = None,
    clip_grad_norm: Optional[float] = None,
    return_lr_schedule: bool = False,
):
    schedule = _lr_schedule(learning_rate, warmup_steps, cosine_decay_steps)
    parts = []
    if clip_grad_norm is not None:
        parts.append(optax.clip_by_global_norm(clip_grad_norm))
    parts.append(optax.scale_by_adam())
    if weight_decay is not None:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(_scale_by_loggable_schedule(schedule))
    tx = optax.chain(*parts)
    if return_lr_schedule:
        return tx, schedule
    return tx


def optimizer_lr(opt_state) -> Optional[object]:
    """Current learning rate from the (possibly nested) optimizer state."""
    hp = getattr(opt_state, "hyperparams", None)
    if hp and "learning_rate" in hp:
        return hp["learning_rate"]
    if isinstance(opt_state, (tuple, list)):
        for sub in opt_state:
            lr = optimizer_lr(sub)
            if lr is not None:
                return lr
    return None
