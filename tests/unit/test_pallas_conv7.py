"""Pallas 7x7 tiny-channel-side kernels (ops/pallas_conv7.py) vs the XLA
oracle — interpret mode (pallas_guide.md section 16): both variants
(smallcin / smallcout), both dtypes, bias on/off, shapes that exercise the
H/W ceil-padding and the 128-lane DMA channel pad, the custom VJP, and the
conv2d gate routing."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu import perf_gates
from biasgan_tpu.ops.pallas_conv7 import conv7x7_op, conv7x7_valid


def _ref(xp, k, b):
    y = jax.lax.conv_general_dilated(
        xp, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if b is None else y + b


def _data(cin, cout, h, w, dtype, use_bias, seed=0):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    xp = jax.random.normal(k1, (2, h + 6, w + 6, cin), dtype)
    kern = (jax.random.normal(k2, (7, 7, cin, cout)) * 0.1).astype(dtype)
    bias = (
        (jax.random.normal(k3, (cout,)) * 0.1).astype(dtype)
        if use_bias
        else None
    )
    return xp, kern, bias


@pytest.mark.parametrize("use_bias", [True, False])
@pytest.mark.parametrize(
    "cin,cout,h,w",
    [
        (3, 64, 21, 48, ),   # the stem (smallcin, cin zero-padded to 8)
        (8, 32, 11, 16, ),   # smallcin, already-padded cin, odd H
        (64, 3, 21, 48, ),   # the head (smallcout, cout padded to 8)
        (130, 8, 10, 16, ),  # smallcout with a non-128-multiple cin
    ],
)
def test_conv7x7_matches_xla(cin, cout, h, w, use_bias):
    xp, kern, bias = _data(cin, cout, h, w, jnp.float32, use_bias)
    got = conv7x7_valid(xp, kern, bias, interpret=True)
    want = _ref(xp, kern, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("cin,cout", [(3, 64), (64, 3)])
def test_conv7x7_bf16(cin, cout):
    xp, kern, bias = _data(cin, cout, 16, 32, jnp.bfloat16, True)
    got = conv7x7_valid(xp, kern, bias, interpret=True)
    want = _ref(xp, kern, bias)
    d = np.abs(
        np.asarray(got, np.float32) - np.asarray(want, np.float32)
    ).max()
    assert got.dtype == jnp.bfloat16
    assert d <= 3e-2 * np.abs(np.asarray(want, np.float32)).max()


def test_conv7x7_rejects_fat_both_sides():
    xp, kern, _ = _data(32, 32, 10, 16, jnp.float32, False)
    with pytest.raises(ValueError, match="neither side tiny"):
        conv7x7_valid(xp, kern, None, interpret=True)


def test_conv7x7_vjp_matches_autodiff():
    xp, kern, bias = _data(3, 16, 10, 16, jnp.float32, True)

    def f_pal(xp, k, b):
        return jnp.sum(jnp.sin(conv7x7_op(xp, k, b, True)))

    def f_ref(xp, k, b):
        return jnp.sum(jnp.sin(_ref(xp, k, b)))

    g1 = jax.grad(f_pal, argnums=(0, 1, 2))(xp, kern, bias)
    g2 = jax.grad(f_ref, argnums=(0, 1, 2))(xp, kern, bias)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
        )


def test_conv2d_routes_conv7(monkeypatch):
    """The --conv7_pallas gate routes eligible 7x7 convs (and only those)
    through the kernel, numerics unchanged vs the ungated path."""
    from biasgan_tpu.nn.layers import conv2d

    x = jax.random.normal(jax.random.PRNGKey(0), (1, 40, 48, 3))
    kern = jax.random.normal(jax.random.PRNGKey(1), (7, 7, 3, 16)) * 0.1
    bias = jax.random.normal(jax.random.PRNGKey(2), (16,)) * 0.1
    base = conv2d(x, kern, bias, (1, 1), (3, 3), "reflect", "wrap")
    calls = []
    import biasgan_tpu.ops.pallas_conv7 as pc7

    orig = pc7.conv7x7_valid

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(pc7, "conv7x7_valid", spy)
    with perf_gates.overrides(conv7_pallas="interpret", s2d_min_m=1):
        got = conv2d(x, kern, bias, (1, 1), (3, 3), "reflect", "wrap")
    assert calls, "gate open but the kernel was not routed"
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(base), rtol=1e-5, atol=1e-5
    )
    # ineligible: 3x3 kernel under the same gate -> no kernel call
    calls.clear()
    k3 = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 16)) * 0.1
    with perf_gates.overrides(conv7_pallas="interpret", s2d_min_m=1):
        conv2d(x, k3, None, (1, 1), (1, 1), "reflect", "wrap")
    assert not calls
