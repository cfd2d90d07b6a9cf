"""Unit tests: loss values on fixed inputs vs. hand-computed results
(SURVEY.md section 4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.losses import gan_loss, gradient_penalty, l1_loss


def test_lsgan_values():
    pred = jnp.array([0.0, 1.0, 2.0])
    # real target 1.0: mean((p-1)^2) = (1 + 0 + 1)/3
    np.testing.assert_allclose(float(gan_loss(pred, True, "lsgan")), 2 / 3, rtol=1e-6)
    # fake target 0.0: mean(p^2) = (0 + 1 + 4)/3
    np.testing.assert_allclose(float(gan_loss(pred, False, "lsgan")), 5 / 3, rtol=1e-6)


def test_vanilla_bce_values():
    pred = jnp.array([0.0])
    # BCEWithLogits(0, 1) = log(2)
    np.testing.assert_allclose(
        float(gan_loss(pred, True, "vanilla")), np.log(2), rtol=1e-6
    )
    np.testing.assert_allclose(
        float(gan_loss(pred, False, "vanilla")), np.log(2), rtol=1e-6
    )
    big = jnp.array([10.0])
    assert float(gan_loss(big, True, "vanilla")) < 1e-3
    assert float(gan_loss(big, False, "vanilla")) > 9.0


def test_wgangp_sign():
    pred = jnp.array([1.0, 3.0])
    assert float(gan_loss(pred, True, "wgangp")) == -2.0
    assert float(gan_loss(pred, False, "wgangp")) == 2.0


def test_l1():
    a = jnp.array([[1.0, 2.0]])
    b = jnp.array([[0.0, 4.0]])
    np.testing.assert_allclose(float(l1_loss(a, b)), 1.5, rtol=1e-6)


def test_gradient_penalty_linear_discriminator():
    """For D(x) = sum(x), grad is all-ones so ||grad||_2 = sqrt(numel) and the
    penalty is (sqrt(numel) - 1)^2 exactly, for any interpolation point."""
    real = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 1))
    fake = jax.random.normal(jax.random.PRNGKey(1), (4, 8, 8, 1))
    gp = gradient_penalty(lambda x: jnp.sum(x, axis=(1, 2, 3)), real, fake,
                          jax.random.PRNGKey(2))
    expect = (np.sqrt(64.0) - 1.0) ** 2
    np.testing.assert_allclose(float(gp), expect, rtol=1e-5)


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        gan_loss(jnp.zeros(1), True, "nope")
