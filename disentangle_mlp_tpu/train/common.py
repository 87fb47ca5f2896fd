"""Shared training-state plumbing.

The reference keeps mutable torch Modules + torch.optim.Adam objects and
steps them imperatively (reference: experiments/new_betavaegan.py:49-50,
123, 164, 193). TPU-native form: immutable pytree states threaded through a
single jitted ``train_step(state, batch, rng) -> (state, metrics)``.

Adam hyperparameters match torch.optim.Adam defaults (β1=0.9, β2=0.999,
eps=1e-8), which all reference experiments rely on.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class ModelState:
    """Parameters + BatchNorm running statistics + optimizer state for one
    network (the pytree analogue of a torch Module + its Adam)."""

    params: Any
    batch_stats: Any
    opt_state: Any


def make_adam(lr: float) -> optax.GradientTransformation:
    return optax.adam(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)


def init_model_state(model, rng: jax.Array, sample_input,
                     tx: optax.GradientTransformation,
                     method: Optional[Callable] = None,
                     **apply_kwargs) -> ModelState:
    """Initialize a flax module and its optimizer into a ModelState."""
    init_rngs = {"params": rng, "reparam": jax.random.fold_in(rng, 1)}
    variables = model.init(init_rngs, sample_input, **apply_kwargs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return ModelState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def apply_updates(state: ModelState, grads,
                  tx: optax.GradientTransformation,
                  new_batch_stats=None) -> ModelState:
    updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)
    return ModelState(
        params=new_params,
        batch_stats=state.batch_stats if new_batch_stats is None else new_batch_stats,
        opt_state=new_opt_state,
    )


def sample_labels(rng: jax.Array) -> Dict[str, jax.Array]:
    """Stochastic label smoothing/flipping, one draw per batch:
    real ∈ {0.1, 0.9} w.p. {0.05, 0.95}, fake mirrored
    (reference: new_betavaegan.py:89-90, new_gan.py:77-78)."""
    r_real, r_fake = jax.random.split(rng)
    real = jnp.where(jax.random.uniform(r_real) < 0.05, 0.1, 0.9)
    fake = jnp.where(jax.random.uniform(r_fake) < 0.95, 0.1, 0.9)
    return {"real": real.astype(jnp.float32), "fake": fake.astype(jnp.float32)}
