"""In-graph losses — capability parity with the reference's ``GANLoss`` and
``cal_gradient_penalty`` (models/networks.py, SURVEY.md section 2.2 [K]) plus the
L1 reconstruction/cycle/identity terms.

Everything is a pure function of arrays (computed in f32 regardless of the
compute dtype), so it fuses into the single jitted train step.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

Array = jax.Array

GAN_MODES = ("vanilla", "lsgan", "wgangp")


def gan_loss(prediction: Array, target_is_real: bool, gan_mode: str) -> Array:
    """Reference GANLoss semantics:
      vanilla — BCE-with-logits against a 1.0 / 0.0 label map
      lsgan   — MSE against a 1.0 / 0.0 label map
      wgangp  — -mean(pred) for real, +mean(pred) for fake
    """
    pred = prediction.astype(jnp.float32)
    if gan_mode == "vanilla":
        label = jnp.ones_like(pred) if target_is_real else jnp.zeros_like(pred)
        return optax.sigmoid_binary_cross_entropy(pred, label).mean()
    if gan_mode == "lsgan":
        target = 1.0 if target_is_real else 0.0
        return jnp.mean(jnp.square(pred - target))
    if gan_mode == "wgangp":
        return -pred.mean() if target_is_real else pred.mean()
    raise ValueError(f"unknown gan_mode {gan_mode!r}; expected one of {GAN_MODES}")


def l1_loss(a: Array, b: Array) -> Array:
    return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))


def gradient_penalty(
    d_apply: Callable[[Array], Array],
    real: Array,
    fake: Array,
    rng: jax.Array,
    constant: float = 1.0,
    lp_type: str = "mixed",
) -> Array:
    """WGAN-GP gradient penalty, reference ``cal_gradient_penalty`` semantics
    (type 'mixed': interpolate real/fake with uniform alpha per-sample; the
    penalty is mean((||grad||_2 - constant)^2) with the gradient taken over
    all non-batch dims; eps 1e-16 guards the sqrt like the reference's
    +1e-16). The reference multiplies by lambda_gp=10.0 at the call site.
    """
    if lp_type == "real":
        x = real
    elif lp_type == "fake":
        x = fake
    elif lp_type == "mixed":
        alpha = jax.random.uniform(rng, (real.shape[0],) + (1,) * (real.ndim - 1))
        x = alpha * real + (1.0 - alpha) * fake
    else:
        raise ValueError(f"unknown gradient-penalty type {lp_type!r}")

    def d_sum(inp: Array) -> Array:
        return d_apply(inp).astype(jnp.float32).sum()

    grads = jax.grad(d_sum)(x)
    g = grads.reshape(grads.shape[0], -1).astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(jnp.square(g), axis=1) + 1e-16)
    return jnp.mean(jnp.square(norm - constant))
