"""Unit tests: conv/conv-transpose output sizing vs. the torch formulas,
padding modes, norm semantics (SURVEY.md section 4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.nn.layers import (
    conv2d,
    conv_transpose2d,
    instance_norm,
    pad_hw,
)


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("w_in,k,s,p", [(64, 4, 2, 1), (64, 3, 1, 1), (65, 7, 1, 3), (32, 4, 1, 1)])
def test_conv2d_output_size(w_in, k, s, p):
    x = _rand(0, (2, w_in, w_in, 3))
    kern = _rand(1, (k, k, 3, 5))
    y = conv2d(x, kern, None, (s, s), (p, p))
    expect = (w_in + 2 * p - k) // s + 1  # torch Conv2d formula
    assert y.shape == (2, expect, expect, 5)


@pytest.mark.parametrize(
    "w_in,k,s,p,op", [(16, 4, 2, 1, 0), (16, 3, 2, 1, 1), (7, 4, 2, 1, 0)]
)
def test_conv_transpose2d_output_size(w_in, k, s, p, op):
    x = _rand(0, (2, w_in, w_in, 3))
    kern = _rand(1, (k, k, 3, 5))
    y = conv_transpose2d(x, kern, None, (s, s), (p, p), (op, op))
    expect = (w_in - 1) * s - 2 * p + k + op  # torch ConvTranspose2d formula
    assert y.shape == (2, expect, expect, 5)


def test_pad_modes():
    x = jnp.arange(4.0).reshape(1, 1, 4, 1)
    zero = pad_hw(x, (0, 0), (1, 1), w_mode="zero")
    assert zero[0, 0, 0, 0] == 0 and zero[0, 0, -1, 0] == 0
    wrap = pad_hw(x, (0, 0), (1, 1), w_mode="wrap")
    assert wrap[0, 0, 0, 0] == 3 and wrap[0, 0, -1, 0] == 0
    refl = pad_hw(x, (0, 0), (1, 1), w_mode="reflect")
    assert refl[0, 0, 0, 0] == 1 and refl[0, 0, -1, 0] == 2


def test_instance_norm_stats():
    x = _rand(0, (2, 8, 8, 3)) * 5 + 2
    y = instance_norm(x)
    mean = jnp.mean(y, axis=(1, 2))
    var = jnp.var(y, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), 1.0, atol=1e-3)


def test_conv_transpose_matches_manual_dilation():
    """convT(k4,s2,p1) == correlate(dilate(x), flip(kernel)) padded by 2."""
    x = _rand(0, (1, 6, 6, 2))
    kern = _rand(1, (4, 4, 2, 3))
    y = conv_transpose2d(x, kern, None, (2, 2), (1, 1))
    # manual: dilate then correlate with flipped kernel
    xd = jnp.zeros((1, 11, 11, 2)).at[:, ::2, ::2, :].set(x)
    xd = jnp.pad(xd, ((0, 0), (2, 2), (2, 2), (0, 0)))
    ref = jax.lax.conv_general_dilated(
        xd, kern[::-1, ::-1], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)
