"""Randomized shape/mode sweep for the three fused kernel families
(ops/pallas_conv: conv3x3_fused block conv, conv3x3s2_fused down,
convt3x3s2_fused up) against their XLA oracles in interpret mode — the
fixed-shape suites pin the judged configs; this sweep walks the tiling
edge cases (prime heights, partial last tiles, single-tile runs, odd
channel mixes, both pad modes) with seeded rng so failures reproduce."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.nn.layers import conv_transpose2d, instance_norm, pad_hw
from biasgan_tpu.ops.pallas_conv import (
    FusedBlockPlan,
    conv3x3_fused,
    conv3x3s2_fused,
    convt3x3s2_fused,
    interleave_phases,
)


def _case(seed):
    """Random (n, h, w, c, cout, th, h_mode, w_mode) with the kernels'
    structural constraints (w % 8, even h for the down conv)."""
    r = np.random.default_rng(seed)
    n = int(r.integers(1, 3))
    h = int(r.integers(5, 30))
    w = 8 * int(r.integers(1, 5))
    c = int(r.choice([8, 16, 64]))
    cout = int(r.choice([8, 16, 64]))
    th = int(r.choice([2, 3, 4, 8]))
    h_mode = str(r.choice(["reflect", "zero", "wrap"]))
    w_mode = str(r.choice(["wrap", "zero"]))
    return n, h, w, c, cout, th, h_mode, w_mode


def _data(n, h, w, c, cout, seed):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (n, h, w, c))
    kern = jax.random.normal(k2, (3, 3, c, cout)) * 0.05
    bias = jax.random.normal(k3, (cout,)) * 0.1
    return x, kern, bias


def _ref_conv(x, kern, bias, strides, h_mode, w_mode):
    xp = pad_hw(x, (1, 1), (1, 1), h_mode, w_mode)
    y = jax.lax.conv_general_dilated(
        xp, kern.astype(x.dtype), strides, "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_block_conv(seed):
    n, h, w, c, cout, th, h_mode, w_mode = _case(seed)
    cout = c  # the block kernel is square-channel (resnet blocks)
    x, kern, bias = _data(n, h, w, c, cout, seed + 100)
    h_run = -(-h // th) * th
    plan = FusedBlockPlan(h, th, h_run, True)
    xr = jnp.concatenate(
        [x, jnp.full((n, h_run - h, w, c), 9.5, x.dtype)], axis=1
    ) if h_run > h else x
    y, (ms, mq) = conv3x3_fused(
        xr, kern, bias, plan=plan, h_mode=h_mode, w_mode=w_mode,
        want_moments=True,
    )
    want = _ref_conv(x, kern, bias, (1, 1), h_mode, w_mode)
    np.testing.assert_allclose(
        np.asarray(y[:, :h]), np.asarray(want), rtol=2e-5, atol=2e-5,
        err_msg=f"case {(n, h, w, c, th, h_mode, w_mode)}",
    )
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(ms), wf.sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(mq), (wf * wf).sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("seed", range(8, 16))
def test_fuzz_down_conv(seed):
    n, h, w, c, cout, th, _, w_mode = _case(seed)
    h = h + (h % 2)  # even H
    if (w // 2) % 8:
        w = 16 * max(1, w // 16)
    x, kern, bias = _data(n, h, w, c, cout, seed + 200)
    h2 = h // 2
    th = min(th, h2)
    plan = FusedBlockPlan(h2, th, -(-h2 // th) * th, True)
    y, (ms, mq) = conv3x3s2_fused(
        x, kern, bias, plan=plan, w_mode=w_mode, want_moments=True
    )
    want = _ref_conv(x, kern, bias, (2, 2), "zero", w_mode)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want), rtol=2e-5, atol=2e-5,
        err_msg=f"case {(n, h, w, c, cout, th, w_mode)}",
    )
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(ms), wf.sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("seed", range(16, 24))
def test_fuzz_up_convt(seed):
    n, h, w, c, cout, th, _, w_mode = _case(seed)
    th = min(th, h)
    x, kern, bias = _data(n, h, w, c, cout, seed + 300)
    plan = FusedBlockPlan(h, th, -(-h // th) * th, True)
    xr = jnp.concatenate(
        [x, jnp.full((n, plan.h_run - h, w, c), 9.5, x.dtype)], axis=1
    ) if plan.h_run > h else x
    phases, (ms, mq) = convt3x3s2_fused(
        xr, kern, bias, plan=plan, w_mode=w_mode, want_moments=True
    )
    y = interleave_phases(phases, h)
    want = conv_transpose2d(
        x, kern, bias, (2, 2), (1, 1), (1, 1), w_mode=w_mode
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want), rtol=2e-5, atol=2e-5,
        err_msg=f"case {(n, h, w, c, cout, th, w_mode)}",
    )
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(ms), wf.sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )
