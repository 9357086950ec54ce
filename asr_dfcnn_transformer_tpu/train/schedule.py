"""Learning-rate schedules.

:func:`polynomial_decay_with_cycle` reproduces
``tf.train.polynomial_decay(..., cycle=True, power=0.5)`` as used by every
reference trainer (``acoustic_model.py:82-87``, ``language_model.py:68-70``):
with cycling, the decay horizon is stretched to the next multiple of
``decay_steps`` so the rate saw-tooths toward ``end_lr`` instead of
flat-lining.
"""

from __future__ import annotations

import jax.numpy as jnp


def polynomial_decay_with_cycle(init_lr: float, decay_steps: int,
                                end_lr: float = 1e-6, power: float = 0.5,
                                cycle: bool = True):
    """Returns an optax-style schedule fn step -> lr."""

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if cycle:
            mult = jnp.maximum(
                1.0, jnp.ceil((step + 1e-8) / decay_steps))
            horizon = decay_steps * mult
        else:
            horizon = jnp.asarray(decay_steps, jnp.float32)
            step = jnp.minimum(step, horizon)
        frac = 1.0 - step / horizon
        return (init_lr - end_lr) * (frac ** power) + end_lr

    return schedule
