"""Optimizer factory.

Capability parity with `serl_launcher/common/optimizers.py:6-56` (warmup +
optional cosine decay, optional grad-norm clip, adam/adamw with
inject_hyperparams so the learning rate is loggable).
"""

from typing import Optional

import optax


def make_optimizer(
    learning_rate: float = 3e-4,
    warmup_steps: int = 0,
    cosine_decay_steps: Optional[int] = None,
    weight_decay: Optional[float] = None,
    clip_grad_norm: Optional[float] = None,
    return_lr_schedule: bool = False,
):
    if cosine_decay_steps is not None:
        lr_schedule = optax.warmup_cosine_decay_schedule(
            init_value=0.0,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=cosine_decay_steps,
            end_value=0.0,
        )
    elif warmup_steps > 0:
        lr_schedule = optax.join_schedules(
            [
                optax.linear_schedule(0.0, learning_rate, warmup_steps),
                optax.constant_schedule(learning_rate),
            ],
            [warmup_steps],
        )
    else:
        lr_schedule = optax.constant_schedule(learning_rate)

    @optax.inject_hyperparams
    def _optimizer(learning_rate: float):
        stages = []
        if clip_grad_norm is not None:
            stages.append(optax.clip_by_global_norm(clip_grad_norm))
        if weight_decay is not None:
            stages.append(optax.adamw(learning_rate, weight_decay=weight_decay))
        else:
            stages.append(optax.adam(learning_rate))
        return optax.chain(*stages)

    tx = _optimizer(learning_rate=lr_schedule)
    if return_lr_schedule:
        return tx, lr_schedule
    return tx


def optimizer_lr(opt_state) -> Optional[object]:
    """Extract the current learning rate from an inject_hyperparams state."""
    hp = getattr(opt_state, "hyperparams", None)
    if hp and "learning_rate" in hp:
        return hp["learning_rate"]
    return None
