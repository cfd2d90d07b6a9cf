"""Pallas fused instance-norm(+residual)+activation kernel (ops/pallas_fused.py).

Runs the kernel in interpret mode (pallas_guide.md, Debugging) so the TPU
kernel logic is exercised on the CPU test backend, and checks:
  * forward parity vs the pure-jnp reference implementation,
  * custom-VJP backward parity vs jax autodiff of the reference,
  * the VMEM guard rail (oversized blocks fall back to XLA),
  * norm_act integration: generator/discriminator forwards are identical
    with the fused op and with the plain instance-norm chain.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.ops.pallas_fused import (
    _block_fits,
    _reference_impl,
    fused_instance_norm_act,
)


def _x(shape, seed=0, dtype=jnp.float32):
    return jax.random.normal(jax.random.PRNGKey(seed), shape, dtype)


@pytest.mark.parametrize("activation", ["none", "relu", "lrelu"])
@pytest.mark.parametrize("with_res", [False, True])
def test_kernel_forward_parity(activation, with_res):
    x = _x((2, 16, 16, 8))
    r = _x((2, 16, 16, 8), seed=1) if with_res else None
    got = fused_instance_norm_act(x, r, activation, 1e-5, True, True)  # interpret
    want = _reference_impl(x, r, activation, 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


def test_kernel_channel_tiling():
    # C = 256 tiles as 2 x 128 lanes (grid over channel blocks)
    x = _x((1, 8, 8, 256))
    got = fused_instance_norm_act(x, None, "relu", 1e-5, True, True)
    want = _reference_impl(x, None, "relu", 1e-5)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("activation", ["none", "relu", "lrelu"])
def test_custom_vjp_matches_autodiff(activation):
    x = _x((2, 12, 12, 4))
    r = _x((2, 12, 12, 4), seed=3)

    def f_fused(x, r):
        return jnp.sum(jnp.sin(fused_instance_norm_act(x, r, activation)))

    def f_ref(x, r):
        return jnp.sum(jnp.sin(_reference_impl(x, r, activation, 1e-5)))

    gx, gr = jax.grad(f_fused, argnums=(0, 1))(x, r)
    gx_ref, gr_ref = jax.grad(f_ref, argnums=(0, 1))(x, r)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gr_ref), rtol=1e-5, atol=1e-5)


def test_custom_vjp_no_residual():
    x = _x((1, 10, 10, 4))
    g = jax.grad(lambda x: jnp.sum(fused_instance_norm_act(x, None, "relu") ** 2))(x)
    g_ref = jax.grad(lambda x: jnp.sum(_reference_impl(x, None, "relu", 1e-5) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-5, atol=1e-5)


def test_vmem_guard():
    assert _block_fits(_x((1, 64, 64, 128)))
    assert not _block_fits(jax.ShapeDtypeStruct((1, 512, 512, 128), jnp.float32))


def test_bf16_in_out():
    x = _x((2, 16, 16, 8), dtype=jnp.bfloat16)
    got = fused_instance_norm_act(x, None, "relu", 1e-5, True, True)
    assert got.dtype == jnp.bfloat16
    want = _reference_impl(x, None, "relu", 1e-5)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), rtol=1e-2, atol=1e-2
    )


def test_norm_act_network_integration():
    """ResNet generator forward must be identical whether the fused op or the
    plain chain runs (on CPU the fused op falls back to _reference_impl, which
    is numerically the instance_norm + add + act chain)."""
    from biasgan_tpu.nn import define_G, init_params
    from biasgan_tpu.nn.layers import apply_activation, instance_norm

    G = define_G("resnet_3blocks", output_nc=2, ngf=8, norm="instance")
    x = _x((1, 32, 32, 2), seed=7)
    v = init_params(G, jax.random.PRNGKey(0), x)
    y = G.apply(v, x, False)
    assert y.shape == x.shape
    # plain chain on the same sub-input agrees with the fused op
    h = _x((1, 16, 16, 8), seed=9)
    fused = fused_instance_norm_act(h, None, "relu")
    plain = apply_activation(instance_norm(h), "relu")
    np.testing.assert_allclose(np.asarray(fused), np.asarray(plain), rtol=1e-6, atol=1e-6)
