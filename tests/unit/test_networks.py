"""Unit tests: network shapes and parameter counts vs. analytic formulas /
the published canonical counts (SURVEY.md section 4 item 1)."""

import jax
import jax.numpy as jnp
import pytest

from biasgan_tpu.nn import define_D, define_G, init_params, count_params


RNG = jax.random.PRNGKey(0)


def test_unet256_param_count_canonical():
    """The canonical pix2pix unet_256 (3->3, ngf 64, batchnorm) has
    54,413,955 parameters — pins our channel schedule + bias rules to the
    reference family exactly."""
    G = define_G("unet_256", output_nc=3, ngf=64, norm="batch", use_dropout=True)
    v = init_params(G, RNG, jnp.zeros((1, 256, 256, 3)), train=False)
    assert count_params(v["params"]) == 54_413_955


def test_patchgan_param_count_canonical():
    """Canonical 3-layer PatchGAN on 6 input channels (pix2pix conditional D)
    has 2,768,705 parameters."""
    D = define_D("basic", ndf=64, norm="batch")
    v = init_params(D, RNG, jnp.zeros((1, 256, 256, 6)), train=False)
    assert count_params(v["params"]) == 2_768_705


def test_resnet9_param_count_canonical():
    """Canonical resnet_9blocks (3->3, ngf 64, instance norm) has
    11,378,179 parameters."""
    G = define_G("resnet_9blocks", output_nc=3, ngf=64, norm="instance")
    v = init_params(G, RNG, jnp.zeros((1, 64, 64, 3)))
    assert count_params(v["params"]) == 11_378_179


@pytest.mark.parametrize("name,downs", [("unet_d4", 4), ("unet_64", 6)])
def test_unet_bottleneck_reaches_one(name, downs):
    size = 2**downs
    G = define_G(name, output_nc=1, ngf=8, norm="instance")
    v = init_params(G, RNG, jnp.zeros((1, size, size, 1)))
    y = G.apply(v, jnp.zeros((2, size, size, 1)), False)
    assert y.shape == (2, size, size, 1)


def test_patchgan_receptive_field_shape():
    """basic D at 256 -> 30x30 patch logits (70x70 receptive field)."""
    D = define_D("basic", ndf=64, norm="instance")
    v = init_params(D, RNG, jnp.zeros((1, 256, 256, 3)))
    y = D.apply(v, jnp.zeros((1, 256, 256, 3)), False)
    assert y.shape == (1, 30, 30, 1)


def test_pixel_discriminator_shape():
    D = define_D("pixel", ndf=16, norm="instance")
    v = init_params(D, RNG, jnp.zeros((1, 32, 32, 3)))
    y = D.apply(v, jnp.zeros((1, 32, 32, 3)), False)
    assert y.shape == (1, 32, 32, 1)


def test_tanh_output_range():
    G = define_G("unet_d4", output_nc=1, ngf=8, norm="instance")
    v = init_params(G, RNG, jnp.zeros((1, 16, 16, 1)))
    y = G.apply(v, 10 * jax.random.normal(RNG, (1, 16, 16, 1)), False)
    assert float(jnp.max(jnp.abs(y))) <= 1.0


def test_out_activation_none():
    """With identical params, the 'tanh' head output equals tanh of the
    'none' head output — i.e. 'none' really removes the bounding."""
    G0 = define_G("unet_d4", output_nc=1, ngf=8, norm="instance", out_activation="none")
    G1 = define_G("unet_d4", output_nc=1, ngf=8, norm="instance", out_activation="tanh")
    x = jax.random.normal(RNG, (1, 16, 16, 1))
    v = init_params(G0, RNG, x)
    y_none = G0.apply(v, x, False)
    y_tanh = G1.apply(v, x, False)
    import numpy as np

    np.testing.assert_allclose(
        np.asarray(jnp.tanh(y_none)), np.asarray(y_tanh), rtol=1e-6, atol=1e-6
    )
