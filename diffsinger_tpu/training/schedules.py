"""Learning-rate schedules.

Behavioral parity: RSQRT warmup schedule (reference utils/training_utils.py:16-24:
``lr * min(step/warmup, 1) * max(warmup, step)^-0.5 * hidden^-0.5`` floored at
1e-7) and StepLR decay gamma=0.5 every ``decay_steps`` (reference usr/task.py:75-76
via torch StepLR). Expressed as optax-compatible ``step -> lr`` callables.
"""

from __future__ import annotations

import jax.numpy as jnp


def rsqrt_schedule(lr: float, warmup_updates: int = 8000, hidden_size: int = 256):
    def schedule(step):
        step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        warmup = jnp.minimum(step / warmup_updates, 1.0)
        rsqrt_decay = jnp.maximum(float(warmup_updates), step) ** -0.5
        return jnp.maximum(lr * warmup * rsqrt_decay * hidden_size ** -0.5, 1e-7)

    return schedule


def step_lr_schedule(lr: float, decay_steps: int = 50000, gamma: float = 0.5):
    def schedule(step):
        step = step.astype(jnp.float32) if hasattr(step, "astype") else float(step)
        return lr * gamma ** jnp.floor(step / decay_steps)

    return schedule


def grad_accum_schedule(scheduling: dict, batches_per_epoch: int):
    """Per-epoch gradient-accumulation schedule as an ``every_k_schedule``
    callable for ``optax.MultiSteps``.

    Behavioral parity: reference ``GradientAccumulationScheduler``
    (utils/pl_utils.py:348-372): ``{epoch: factor}`` with epochs indexed from
    1; during epoch e the factor is the value of the largest key <= e; if no
    key 1 is given, ``{1: 1}`` is implied.

    optax's MultiSteps schedule is keyed on the optimizer-update count (its
    ``gradient_step``), not the mini-batch count, so epoch boundaries are
    converted: an epoch span of E epochs at factor f contributes
    ``E * batches_per_epoch / f`` updates.
    """
    if not scheduling:
        raise TypeError("Empty dict cannot be interpreted correct")
    sched = {int(k): int(v) for k, v in scheduling.items()}
    if min(sched) < 1:
        raise IndexError(f"Epochs indexing from 1, epoch {min(sched)} "
                         "cannot be interpreted correct")
    sched.setdefault(1, 1)
    keys = sorted(sched)
    # piecewise segments in update-count space: (start_update, factor)
    starts, factors = [], []
    u = 0.0
    for i, k in enumerate(keys):
        starts.append(u)
        factors.append(sched[k])
        if i + 1 < len(keys):
            span_epochs = keys[i + 1] - k
            u += span_epochs * batches_per_epoch / sched[k]
    starts_arr = jnp.asarray(starts, jnp.float32)
    factors_arr = jnp.asarray(factors, jnp.int32)

    def every_k(gradient_step):
        step = jnp.asarray(gradient_step, jnp.float32)
        idx = jnp.sum(step >= starts_arr) - 1
        return factors_arr[jnp.clip(idx, 0, len(factors) - 1)]

    return every_k


def build_lr_schedule(hp):
    """Diffusion tasks use StepLR when ``decay_steps`` is set; FS2 tasks use
    RSQRT warmup (reference usr/task.py:75-76, tasks/tts/tts.py:37-44)."""
    if hp.get("decay_steps"):
        return step_lr_schedule(float(hp["lr"]), int(hp["decay_steps"]))
    return rsqrt_schedule(float(hp["lr"]), int(hp.get("warmup_updates", 8000)),
                          int(hp.get("hidden_size", 256)))
