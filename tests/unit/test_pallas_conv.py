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
@pytest.mark.parametrize("variant", ["rowcat", "shift3"])
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
