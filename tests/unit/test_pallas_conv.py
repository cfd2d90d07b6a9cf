"""Pallas 3x3 conv kernel (ops/pallas_conv.py) vs the XLA oracle —
interpret mode (pallas_guide.md section 16), every epilogue combination and
both W pad modes, on MXU-realistic channel counts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.ops.pallas_conv import conv3x3_pallas, reference_conv3x3


def _data(n=2, h=8, w=8, c=256, cout=256, seed=0, dtype=jnp.float32):
    k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(seed), 4)
    x = jax.random.normal(k1, (n, h, w, c), dtype)
    kern = (jax.random.normal(k2, (3, 3, c, cout)) * 0.05).astype(dtype)
    bias = jax.random.normal(k3, (cout,), jnp.float32) * 0.1
    res = jax.random.normal(k4, (n, h, w, cout), dtype)
    return x, kern, bias, res


@pytest.mark.parametrize("w_pad", ["zero", "wrap"])
@pytest.mark.parametrize("act", ["none", "relu", "lrelu"])
def test_conv3x3_matches_xla(w_pad, act):
    x, kern, bias, res = _data()
    got = conv3x3_pallas(
        x, kern, bias, res, activation=act, w_pad_mode=w_pad, interpret=True
    )
    want = reference_conv3x3(
        x, kern, bias, res, activation=act, w_pad_mode=w_pad
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("w_pad", ["zero", "wrap"])
@pytest.mark.parametrize("variant", ["rowcat", "shift3", "im2col"])
def test_conv3x3_variants(w_pad, variant):
    x, kern, bias, res = _data(h=16, w=8)
    got = conv3x3_pallas(
        x, kern, bias, res, activation="lrelu", w_pad_mode=w_pad,
        interpret=True, variant=variant,
    )
    want = reference_conv3x3(
        x, kern, bias, res, activation="lrelu", w_pad_mode=w_pad
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_no_epilogue_multi_rowtile():
    # H=16 forces a multi-program row grid (the double-buffer DMA path)
    x, kern, _, _ = _data(n=2, h=16, w=8, c=128, cout=128, seed=1)
    got = conv3x3_pallas(x, kern, interpret=True)
    want = reference_conv3x3(x, kern)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_oracle_matches_layers_conv2d():
    """The XLA oracle itself must equal the production conv2d (torch
    Conv2d(3,s1,p1) semantics) so kernel-vs-oracle parity transfers to
    kernel-vs-framework parity."""
    from biasgan_tpu.nn.layers import conv2d

    x, kern, bias, _ = _data(n=1, h=8, w=8, c=64, cout=64, seed=2)
    want = conv2d(x, kern, bias, (1, 1), (1, 1))
    got = reference_conv3x3(x, kern, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_op_grads_match_autodiff():
    """conv3x3_op's custom VJP (input grad via the SAME Pallas kernel,
    weight grad via the batch-contraction GEMM) equals plain autodiff
    through the XLA conv, for value, dx, dw and dbias."""
    x, kern, bias, _ = _data(n=2, h=8, w=8, c=128, cout=128, seed=3)
    from biasgan_tpu.ops.pallas_conv import conv3x3_op

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    def loss_pallas(xp_, k_, b_):
        y = conv3x3_op(xp_, k_, b_, True)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    def loss_xla(xp_, k_, b_):
        y = jax.lax.conv_general_dilated(
            xp_, k_, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + b_.astype(jnp.float32)
        return jnp.sum(jnp.sin(y))

    v1, (dx1, dw1, db1) = jax.value_and_grad(loss_pallas, argnums=(0, 1, 2))(
        xp, kern, bias
    )
    v2, (dx2, dw2, db2) = jax.value_and_grad(loss_xla, argnums=(0, 1, 2))(
        xp, kern, bias
    )
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(dx1), np.asarray(dx2), rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(dw1), np.asarray(dw2), rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(np.asarray(db1), np.asarray(db2), rtol=1e-4, atol=3e-5)


def test_conv2d_pallas_gate_matches_xla(monkeypatch):
    """BIASGAN_PALLAS_CONV=interpret routes eligible 3x3 convs in the
    production conv2d through the Pallas path; values and grads must match
    the default XLA path, reflect padding included (the pad stays outside
    the custom VJP, so its adjoint is XLA's)."""
    from biasgan_tpu.nn.layers import conv2d

    x, kern, bias, _ = _data(n=1, h=8, w=8, c=128, cout=128, seed=4)

    def loss(fn_env, x_, k_, b_):
        monkeypatch.setenv("BIASGAN_PALLAS_CONV", fn_env)
        y = conv2d(x_, k_, b_, (1, 1), (1, 1), h_mode="reflect")
        return jnp.sum(jnp.cos(y.astype(jnp.float32)))

    v_x, g_x = jax.value_and_grad(lambda a: loss("", a, kern, bias))(x)
    v_p, g_p = jax.value_and_grad(
        lambda a: loss("interpret", a, kern, bias)
    )(x)
    np.testing.assert_allclose(float(v_p), float(v_x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x), rtol=1e-4, atol=1e-5)


def test_conv3x3_prime_height():
    """H need not divide the row tile (full-globe H after downsampling is
    181, prime): rows are padded to the tile and trimmed."""
    x, kern, bias, _ = _data(n=1, h=13, w=8, c=128, cout=128, seed=5)
    got = conv3x3_pallas(x, kern, bias, interpret=True)
    want = reference_conv3x3(x, kern, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_conv3x3_bf16():
    x, kern, bias, res = _data(dtype=jnp.bfloat16, h=8, w=8)
    got = conv3x3_pallas(
        x, kern, bias, res, activation="relu", interpret=True
    )
    want = reference_conv3x3(x, kern, bias, res, activation="relu")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_conv3x3_bf16_width_not_16_aligned():
    """bf16 W=16: the padded input width (18) rounds to the (16, 128) bf16
    tile (32 dead cols the taps never read), not the f32 8-tile (24) —
    Mosaic's sub-4-byte sublane tiling (advisor r3). The dead columns must
    not change the result."""
    x, kern, bias, res = _data(dtype=jnp.bfloat16, h=8, w=16)
    got = conv3x3_pallas(
        x, kern, bias, res, activation="relu", interpret=True
    )
    want = reference_conv3x3(x, kern, bias, res, activation="relu")
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
