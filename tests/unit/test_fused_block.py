"""Fused resnet-block conv (ops/pallas_conv.conv3x3_fused): SAME pad
assembled in-kernel, instance-norm+ReLU prologue, in-kernel moments —
interpret-mode parity vs the XLA composition (pad_hw + lax conv +
instance_norm), including the garbage-tail h_run protocol (prime H) and the
full ResNetGenerator chain via BIASGAN_FUSED_BLOCK=interpret."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.nn.layers import instance_norm, pad_hw
from biasgan_tpu.ops.pallas_conv import (
    FusedBlockPlan,
    conv3x3_fused,
    fused_block_plan,
    instance_moments_to_affine,
)


def _ref_conv_same(x, kern, bias, h_mode, w_mode):
    xp = pad_hw(x, (1, 1), (1, 1), h_mode, w_mode)
    y = jax.lax.conv_general_dilated(
        xp, kern.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _data(n=2, h=13, w=16, c=128, cout=128, seed=0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (n, h, w, c), dtype)
    kern = (jax.random.normal(k2, (3, 3, c, cout)) * 0.05).astype(dtype)
    bias = jax.random.normal(k3, (cout,), jnp.float32) * 0.1
    return x, kern, bias


def _run_fused(x, kern, bias, plan, h_mode, w_mode, prologue=None):
    """Pad x to h_run with a NON-ZERO sentinel tail (garbage rows must never
    be read) and run the fused kernel."""
    n, h, w, c = x.shape
    if plan.h_run > h:
        tail = jnp.full((n, plan.h_run - h, w, c), 7.75, x.dtype)
        xr = jnp.concatenate([x, tail], axis=1)
    else:
        xr = x
    return conv3x3_fused(
        xr, kern, bias, prologue=prologue, act_pre="relu", plan=plan,
        h_mode=h_mode, w_mode=w_mode, want_moments=True,
    )


@pytest.mark.parametrize("h_mode", ["reflect", "zero", "wrap"])
@pytest.mark.parametrize("w_mode", ["wrap", "zero", "reflect"])
def test_fused_conv_pad_modes_prime_height(h_mode, w_mode):
    # h=13 with th=4 -> partial last tile (k=1): the garbage-tail protocol
    x, kern, bias = _data()
    plan = FusedBlockPlan(13, 4, 16, True)
    y, (ms, mq) = _run_fused(x, kern, bias, plan, h_mode, w_mode)
    want = _ref_conv_same(x, kern, bias, h_mode, w_mode)
    np.testing.assert_allclose(
        np.asarray(y[:, :13]), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(ms), wf.sum(axis=(1, 2)), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(mq), (wf * wf).sum(axis=(1, 2)), rtol=1e-4, atol=1e-4
    )


def test_fused_conv_exact_tiling_and_single_tile():
    x, kern, bias = _data(h=16)
    for th, h_run in ((8, 16), (32, 32)):  # th | h, and th > h (one tile)
        plan = FusedBlockPlan(16, th, h_run, True)
        y, _ = _run_fused(x, kern, bias, plan, "reflect", "wrap")
        want = _ref_conv_same(x, kern, bias, "reflect", "wrap")
        np.testing.assert_allclose(
            np.asarray(y[:, :16]), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_fused_conv_prologue_matches_norm_relu_chain():
    """prologue=(a,b) + act_pre=relu must equal conv(relu(instance_norm(x)))
    with the affine derived from the kernel's own moments."""
    x, kern, bias = _data(h=11, seed=1)
    plan = FusedBlockPlan(11, 4, 12, True)
    # first conv produces y0 + moments; second consumes the prologue
    y0, m0 = _run_fused(x, kern, bias, plan, "reflect", "wrap")
    a0, b0 = instance_moments_to_affine(*m0, 11 * x.shape[2])
    y1, _ = _run_fused(y0[:, :11], kern, bias, plan, "reflect", "wrap",
                       prologue=(a0, b0))
    ref0 = _ref_conv_same(x, kern, bias, "reflect", "wrap")
    z = jax.nn.relu(instance_norm(ref0))
    ref1 = _ref_conv_same(z, kern, bias, "reflect", "wrap")
    np.testing.assert_allclose(
        np.asarray(y1[:, :11]), np.asarray(ref1), rtol=1e-4, atol=1e-4
    )


def test_fused_conv_bf16():
    x, kern, bias = _data(h=12, dtype=jnp.bfloat16, seed=2)
    plan = FusedBlockPlan(12, 4, 12, True)
    y, (ms, _) = _run_fused(x, kern, bias, plan, "reflect", "wrap")
    want = _ref_conv_same(x, kern, bias, "reflect", "wrap")
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )
    # moments are f32 of the STORED bf16 value — exactly instance_norm's view
    np.testing.assert_allclose(
        np.asarray(ms),
        np.asarray(want, np.float32).sum(axis=(1, 2)),
        rtol=1e-2, atol=1e-1,
    )


def test_fused_block_plan_gates():
    assert fused_block_plan(13, 17, 128, 128, jnp.float32) is None  # W%8
    assert fused_block_plan(2, 16, 128, 128, jnp.float32) is None   # H<3
    p = fused_block_plan(181, 360, 256, 256, jnp.bfloat16)
    assert p is not None and p.h_run % p.th == 0 and p.h_run >= 181


def test_resnet_generator_fused_matches_default(monkeypatch):
    """Whole-chain equivalence: ResNetGenerator forward with
    BIASGAN_FUSED_BLOCK=interpret equals the default XLA path."""
    from biasgan_tpu.nn.generators import ResNetGenerator

    g = ResNetGenerator(
        output_nc=3, ngf=8, n_blocks=2, norm_type="instance",
        use_dropout=False, w_mode="wrap",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 13, 32, 3))
    params = g.init(jax.random.PRNGKey(1), x)
    want = g.apply(params, x)

    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")
    monkeypatch.setenv("BIASGAN_FUSED_TH", "2")  # multi-tile + partial
    got = g.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_resnet_generator_staged_matches_all(monkeypatch):
    """pre -> blocks -> post staged execution (three separate apply calls,
    same params) must equal the single stage='all' forward — on both the
    default and the fused path. The staged entry points exist so the fused
    inference path can run each region as its own jit call (generators.py
    docstring: cross-region scheduling penalty)."""
    from biasgan_tpu.nn.generators import ResNetGenerator

    g = ResNetGenerator(
        output_nc=3, ngf=8, n_blocks=2, norm_type="instance",
        use_dropout=False, w_mode="wrap",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 13, 32, 3))
    params = g.init(jax.random.PRNGKey(1), x)

    for fused in (False, True):
        if fused:
            monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
            monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")
            monkeypatch.setenv("BIASGAN_FUSED_TH", "2")
        want = g.apply(params, x)
        h = g.apply(params, x, stage="pre")
        h = g.apply(params, h, stage="blocks")
        got = g.apply(params, h, stage="post")
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_resnet_generator_fused_gates_off_in_train(monkeypatch):
    """Training (and dropout/batch-norm configs) must never take the fused
    inference path."""
    from biasgan_tpu.nn.generators import ResNetGenerator

    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")
    g = ResNetGenerator(
        output_nc=3, ngf=8, n_blocks=1, norm_type="instance",
        use_dropout=True, w_mode="reflect",
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 13, 32, 3))
    params = g.init(jax.random.PRNGKey(1), x)
    # dropout config: plan is None on both paths -> identical by identity
    monkeypatch.delenv("BIASGAN_FUSED_BLOCK")
    want = g.apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)},
                   train=True)
    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    got = g.apply(params, x, rngs={"dropout": jax.random.PRNGKey(2)},
                  train=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
