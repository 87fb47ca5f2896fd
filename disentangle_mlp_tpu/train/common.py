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


def _scale_by_adam_compact(b1: float, b2: float, eps: float,
                           moment_dtype) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with BOTH moments stored in ``moment_dtype``
    (bf16 halves the optimizer state's HBM traffic — ~16 ms of the 50 ms
    flagship step is pure Adam state streaming, benchmarks/README_PERF.md).
    All arithmetic runs in float32; only the carried mu/nu round to
    ``moment_dtype`` at store. The update math is otherwise identical to
    optax.adam: m̂/(√v̂ + eps) with 1−βᵗ bias correction."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), moment_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params))

    def update_fn(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree.map(
            lambda m, g: b1 * m.astype(f32) + (1.0 - b1) * g.astype(f32),
            state.mu, updates)
        nu = jax.tree.map(
            lambda v, g: b2 * v.astype(f32)
            + (1.0 - b2) * jnp.square(g.astype(f32)),
            state.nu, updates)
        count = optax.safe_int32_increment(state.count)
        bc1 = 1.0 - jnp.power(b1, count.astype(f32))
        bc2 = 1.0 - jnp.power(b2, count.astype(f32))
        out = jax.tree.map(
            lambda m, v, g: ((m / bc1) / (jnp.sqrt(v / bc2) + eps)
                             ).astype(g.dtype),
            mu, nu, updates)
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m: m.astype(moment_dtype), mu),
            nu=jax.tree.map(lambda v: v.astype(moment_dtype), nu))
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_adam(lr: float,
              moment_dtype: str = "float32") -> optax.GradientTransformation:
    """torch.optim.Adam-default Adam. ``moment_dtype='bfloat16'`` is the
    opt-in perf mode (``--optimizer_dtype``): moments carried in bf16,
    update math still float32 — a documented semantic deviation from the
    reference's all-f32 torch.optim.Adam, OFF by default."""
    if moment_dtype in ("float32", jnp.float32, None):
        return optax.adam(learning_rate=lr, b1=0.9, b2=0.999, eps=1e-8)
    return optax.chain(
        _scale_by_adam_compact(0.9, 0.999, 1e-8, jnp.dtype(moment_dtype)),
        optax.scale(-lr),
    )


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
