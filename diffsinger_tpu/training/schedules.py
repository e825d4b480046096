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


def build_lr_schedule(hp):
    """Diffusion tasks use StepLR when ``decay_steps`` is set; FS2 tasks use
    RSQRT warmup (reference usr/task.py:75-76, tasks/tts/tts.py:37-44)."""
    if hp.get("decay_steps"):
        return step_lr_schedule(float(hp["lr"]), int(hp["decay_steps"]))
    return rsqrt_schedule(float(hp["lr"]), int(hp.get("warmup_updates", 8000)),
                          int(hp.get("hidden_size", 256)))
