"""Diffusion training loop (the reference never shipped one —
gaussian_diffusion.training_losses is referenced by respace.py:127-129 but
undefined; BASELINE.json config 5 expects "Diffusion UNet over encoded
sequences ... fp16_util -> bf16"). bf16 UNet compute, fp32 loss, Adam,
EMA parameters (reference nn.py:71-81 update_ema)."""
from __future__ import annotations

from typing import Any, Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .respace import SpacedDiffusion


def update_ema(ema_params: Any, params: Any, rate: float = 0.9999) -> Any:
    """EMA update ema = rate * ema + (1 - rate) * params, pytree-wide
    (reference diffusion/nn.py:71-81 `update_ema`, functional form)."""
    return jax.tree.map(
        lambda e, p: e * rate + p.astype(e.dtype) * (1.0 - rate),
        ema_params, params,
    )


def make_diffusion_train_step(
    model, diffusion: SpacedDiffusion, optimizer: optax.GradientTransformation,
    ema_rate: float = 0.9999,
):
    def loss_fn(params, x_start, t, rng):
        model_fn = lambda x, tt: model.apply(params, x, tt)
        terms = diffusion.training_losses(model_fn, x_start, t, rng)
        return terms["loss"], terms

    def step(params, ema_params, opt_state, x_start, rng):
        t_rng, noise_rng = jax.random.split(rng)
        t = jax.random.randint(
            t_rng, (x_start.shape[0],), 0, diffusion.num_timesteps
        )
        (loss, terms), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, x_start, t, noise_rng
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        ema_params = update_ema(ema_params, params, ema_rate)
        return params, ema_params, opt_state, loss, terms

    return jax.jit(step, donate_argnums=(0, 1, 2))


def train_diffusion(
    model,
    diffusion: SpacedDiffusion,
    batches: Iterator[np.ndarray],
    num_steps: int,
    learning_rate: float = 1e-4,
    seed: int = 0,
    log_every: int = 10,
    params: Any = None,
    ema_rate: float = 0.9999,
    return_ema: bool = False,
):
    rng = jax.random.PRNGKey(seed)
    first = next(batches)
    if params is None:
        params = model.init(
            rng, jnp.asarray(first), jnp.zeros((first.shape[0],), jnp.int32)
        )
    ema_params = jax.tree.map(jnp.array, params)
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(params)
    step_fn = make_diffusion_train_step(model, diffusion, optimizer, ema_rate)

    batch = first
    for i in range(num_steps):
        rng, step_rng = jax.random.split(rng)
        params, ema_params, opt_state, loss, terms = step_fn(
            params, ema_params, opt_state, jnp.asarray(batch), step_rng
        )
        if (i + 1) % log_every == 0:
            print(
                f"diffusion step {i+1}: loss {float(loss):.5f} "
                f"(mse {float(terms['mse']):.5f}, vb {float(terms['vb']):.5f})",
                flush=True,
            )
        try:
            batch = next(batches)
        except StopIteration:
            break
    if return_ema:
        return params, ema_params
    return params
