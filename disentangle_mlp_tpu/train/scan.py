"""Multi-step scan driver: K training steps per device dispatch.

Each jitted call costs one host→device round trip; over a tunneled or
pod-scheduled TPU that RPC latency can rival the step itself. For
device-resident data (synthetic benches, pre-staged shards), wrapping the
pure step function in ``lax.scan`` executes K steps per dispatch — the
XLA-native equivalent of a training micro-loop, impossible to express in
the reference's imperative torch loop.

Works with any step of the shape used by the experiments:
    step(state..., batch, rng) -> (state..., metrics)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def make_multi_step(step_fn: Callable, n_states: int,
                    donate: bool = True) -> Callable:
    """Wrap ``step_fn(*states, batch, rng) -> (*states, metrics)`` into
    ``multi_step(*states, batches, rng) -> (*states, stacked_metrics)``
    where ``batches`` has a leading steps axis (K, B, ...). Each scan
    iteration folds the step index into ``rng``."""

    def multi_step(*args):
        *states, batches, rng = args
        n_steps = batches.shape[0]

        def body(carry, xs):
            states = carry
            batch, i = xs
            out = step_fn(*states, batch, jax.random.fold_in(rng, i))
            *new_states, metrics = out
            return tuple(new_states), metrics

        steps = jnp.arange(n_steps)
        final_states, metrics = jax.lax.scan(
            body, tuple(states), (batches, steps))
        return (*final_states, metrics)

    donate_argnums = tuple(range(n_states)) if donate else ()
    return jax.jit(multi_step, donate_argnums=donate_argnums)
