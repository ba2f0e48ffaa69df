"""Optimizers and LR schedulers on optax.

TPU-native analog of reference src/transformers/optimization.py
(``get_scheduler`` :960, ``TYPE_TO_SCHEDULER_FUNCTION`` :944, Adafactor
:1057) and trainer_optimizer.py's optimizer zoo. Schedules are pure
``step -> lr`` callables (optax schedules), so the whole update rule jits
into the train step.
"""

from __future__ import annotations

import math
from typing import Optional

import optax


def _warmup(base_lr: float, num_warmup_steps: int):
    return optax.linear_schedule(0.0, base_lr, max(num_warmup_steps, 1))


def get_linear_schedule_with_warmup(base_lr, num_warmup_steps, num_training_steps):
    decay = optax.linear_schedule(base_lr, 0.0, max(num_training_steps - num_warmup_steps, 1))
    return optax.join_schedules([_warmup(base_lr, num_warmup_steps), decay], [num_warmup_steps])


def get_cosine_schedule_with_warmup(base_lr, num_warmup_steps, num_training_steps,
                                    num_cycles: float = 0.5, min_lr_rate: float = 0.0):
    def decay(step):
        import jax.numpy as jnp

        progress = step / max(1, num_training_steps - num_warmup_steps)
        factor = 0.5 * (1.0 + jnp.cos(jnp.pi * num_cycles * 2.0 * jnp.minimum(progress, 1.0)))
        factor = factor * (1 - min_lr_rate) + min_lr_rate
        return base_lr * jnp.maximum(factor, 0.0)

    return optax.join_schedules([_warmup(base_lr, num_warmup_steps), decay], [num_warmup_steps])


def get_constant_schedule_with_warmup(base_lr, num_warmup_steps, *_, **__):
    return optax.join_schedules([_warmup(base_lr, num_warmup_steps),
                                 optax.constant_schedule(base_lr)], [num_warmup_steps])


def get_constant_schedule(base_lr, *_, **__):
    return optax.constant_schedule(base_lr)


def get_inverse_sqrt_schedule(base_lr, num_warmup_steps, *_, timescale=None, **__):
    timescale = timescale or max(num_warmup_steps, 1)

    def decay(step):
        import jax.numpy as jnp

        return base_lr / jnp.sqrt((step + timescale) / timescale)

    return optax.join_schedules([_warmup(base_lr, num_warmup_steps), decay], [num_warmup_steps])


def get_polynomial_decay_schedule_with_warmup(base_lr, num_warmup_steps, num_training_steps,
                                              lr_end=1e-7, power=1.0):
    def decay(step):
        import jax.numpy as jnp

        steps = max(1, num_training_steps - num_warmup_steps)
        remaining = jnp.maximum(1.0 - step / steps, 0.0)
        return (base_lr - lr_end) * remaining**power + lr_end

    return optax.join_schedules([_warmup(base_lr, num_warmup_steps), decay], [num_warmup_steps])


def get_wsd_schedule(base_lr, num_warmup_steps, num_training_steps, num_decay_steps=None,
                     min_lr_ratio=0.0, **__):
    """warmup-stable-decay (reference optimization.py get_wsd_schedule)."""
    num_decay_steps = num_decay_steps or max(1, int(0.1 * num_training_steps))
    stable = num_training_steps - num_warmup_steps - num_decay_steps

    def decay(step):
        import jax.numpy as jnp

        frac = jnp.minimum(step / num_decay_steps, 1.0)
        return base_lr * ((1 - frac) * (1 - min_lr_ratio) + min_lr_ratio)

    return optax.join_schedules(
        [_warmup(base_lr, num_warmup_steps), optax.constant_schedule(base_lr), decay],
        [num_warmup_steps, num_warmup_steps + max(stable, 0)],
    )


TYPE_TO_SCHEDULER_FUNCTION = {
    "linear": get_linear_schedule_with_warmup,
    "cosine": get_cosine_schedule_with_warmup,
    "cosine_with_min_lr": get_cosine_schedule_with_warmup,
    "constant": get_constant_schedule,
    "constant_with_warmup": get_constant_schedule_with_warmup,
    "inverse_sqrt": get_inverse_sqrt_schedule,
    "polynomial": get_polynomial_decay_schedule_with_warmup,
    "warmup_stable_decay": get_wsd_schedule,
}


def get_scheduler(name: str, base_lr: float, num_warmup_steps: int = 0,
                  num_training_steps: Optional[int] = None, scheduler_specific_kwargs=None):
    """reference optimization.py:960 — returns an optax schedule fn."""
    name = str(name).replace("SchedulerType.", "").lower()
    if name not in TYPE_TO_SCHEDULER_FUNCTION:
        raise ValueError(f"Unknown scheduler {name!r}; known: {sorted(TYPE_TO_SCHEDULER_FUNCTION)}")
    fn = TYPE_TO_SCHEDULER_FUNCTION[name]
    return fn(base_lr, num_warmup_steps, num_training_steps, **(scheduler_specific_kwargs or {}))


def create_optimizer(
    name: str,
    schedule,
    *,
    weight_decay: float = 0.0,
    adam_beta1: float = 0.9,
    adam_beta2: float = 0.999,
    adam_epsilon: float = 1e-8,
    max_grad_norm: Optional[float] = 1.0,
    decay_mask_fn=None,
) -> optax.GradientTransformation:
    """Optimizer factory (reference trainer_optimizer.py optimizer zoo —
    the TPU-relevant subset: adamw/adafactor/sgd/lion/ademamix analogs)."""
    name = str(name).replace("OptimizerNames.", "").lower()
    if name in ("adamw", "adamw_torch", "adamw_torch_fused", "adamw_hf"):
        opt = optax.adamw(schedule, b1=adam_beta1, b2=adam_beta2, eps=adam_epsilon,
                          weight_decay=weight_decay, mask=decay_mask_fn)
    elif name == "adafactor":
        opt = optax.adafactor(schedule)
    elif name == "sgd":
        opt = optax.sgd(schedule)
    elif name == "lion":
        opt = optax.lion(schedule, b1=adam_beta1, b2=adam_beta2, weight_decay=weight_decay,
                         mask=decay_mask_fn)
    elif name in ("rmsprop",):
        opt = optax.rmsprop(schedule)
    else:
        raise ValueError(f"Unknown optimizer {name!r}")
    if max_grad_norm and max_grad_norm > 0:
        return optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    return opt
