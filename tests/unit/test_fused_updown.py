"""Fused up/down kernels for the globe G's pre/post regions
(ops/pallas_conv.convt3x3s2_fused / conv3x3s2_fused): interpret-mode parity
vs nn/layers' conv_transpose2d / conv2d oracles, including the prime-H
garbage-tail protocol, the instance-norm prologue, in-kernel moments and the
contiguous phase interleave."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.nn.layers import conv_transpose2d, instance_norm, pad_hw
from biasgan_tpu.ops.pallas_conv import (
    FusedBlockPlan,
    conv3x3s2_fused,
    conv3x3s2_plan,
    convt3x3s2_fused,
    convt3x3s2_plan,
    instance_moments_to_affine,
    interleave_phases,
)


def _data(n=2, h=13, w=16, c=128, cout=128, seed=0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (n, h, w, c), dtype)
    kern = (jax.random.normal(k2, (3, 3, c, cout)) * 0.05).astype(dtype)
    bias = jax.random.normal(k3, (cout,), jnp.float32) * 0.1
    return x, kern, bias


def _run_convt(x, kern, bias, plan, w_mode, prologue=None):
    n, h, w, c = x.shape
    if plan.h_run > h:
        # non-zero sentinel tail: garbage rows must never be read
        tail = jnp.full((n, plan.h_run - h, w, c), 7.75, x.dtype)
        xr = jnp.concatenate([x, tail], axis=1)
    else:
        xr = x
    phases, moments = convt3x3s2_fused(
        xr, kern, bias, prologue=prologue, act_pre="relu", plan=plan,
        w_mode=w_mode, want_moments=True,
    )
    return interleave_phases(phases, h), moments


@pytest.mark.parametrize("w_mode", ["wrap", "zero"])
def test_convt_fused_parity_prime_height(w_mode):
    x, kern, bias = _data()
    plan = FusedBlockPlan(13, 4, 16, True)  # partial last tile (k_last=1)
    y, (ms, mq) = _run_convt(x, kern, bias, plan, w_mode)
    want = conv_transpose2d(
        x, kern, bias, (2, 2), (1, 1), (1, 1), w_mode=w_mode
    )
    assert y.shape == want.shape == (2, 26, 32, 128)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(ms), wf.sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(mq), (wf * wf).sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )


def test_convt_fused_exact_tiling_single_tile():
    x, kern, bias = _data(h=16, seed=1)
    for th, h_run in ((8, 16), (32, 32)):
        plan = FusedBlockPlan(16, th, h_run, True)
        y, _ = _run_convt(x, kern, bias, plan, "wrap")
        want = conv_transpose2d(
            x, kern, bias, (2, 2), (1, 1), (1, 1), w_mode="wrap"
        )
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-5
        )


def test_convt_fused_prologue_matches_norm_relu_chain():
    """prologue=(a,b)+relu from the PREVIOUS layer's moments must equal
    convT(relu(instance_norm(x)))."""
    x, kern, bias = _data(h=11, seed=2)
    # fabricate upstream moments from x itself
    xf = np.asarray(x, np.float32)
    ms = jnp.asarray(xf.sum(axis=(1, 2)))
    mq = jnp.asarray((xf * xf).sum(axis=(1, 2)))
    a, b = instance_moments_to_affine(ms, mq, 11 * x.shape[2])
    plan = FusedBlockPlan(11, 4, 12, True)
    y, _ = _run_convt(x, kern, bias, plan, "wrap", prologue=(a, b))
    z = jax.nn.relu(instance_norm(x))
    want = conv_transpose2d(
        z, kern, bias, (2, 2), (1, 1), (1, 1), w_mode="wrap"
    )
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_convt_fused_bf16():
    x, kern, bias = _data(h=12, dtype=jnp.bfloat16, seed=3)
    plan = FusedBlockPlan(12, 4, 12, True)
    y, _ = _run_convt(x, kern, bias, plan, "wrap")
    want = conv_transpose2d(
        x, kern, bias, (2, 2), (1, 1), (1, 1), w_mode="wrap",
        compute_dtype=jnp.bfloat16,
    )
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_convt_plan_gates():
    assert convt3x3s2_plan(13, 17, 128, 128, jnp.float32) is None  # W%8
    assert convt3x3s2_plan(1, 16, 128, 128, jnp.float32) is None   # H<2
    p = convt3x3s2_plan(181, 360, 256, 128, jnp.bfloat16)
    assert p is not None and p.h_run % p.th == 0 and p.h_run >= 181


# --- stride-2 down conv -----------------------------------------------------


def _ref_down(x, kern, bias, w_mode):
    xp = pad_hw(x, (1, 1), (1, 1), "zero", w_mode)
    y = jax.lax.conv_general_dilated(
        xp, kern.astype(x.dtype), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


@pytest.mark.parametrize("w_mode", ["wrap", "zero"])
def test_down_fused_parity_partial_tile(w_mode):
    # H=26 -> out 13 rows, th=4 -> k_last=1 partial last tile
    x, kern, bias = _data(h=26, w=32, seed=4)
    plan = FusedBlockPlan(13, 4, 16, True)
    y, (ms, mq) = conv3x3s2_fused(
        x, kern, bias, plan=plan, w_mode=w_mode, want_moments=True
    )
    want = _ref_down(x, kern, bias, w_mode)
    assert y.shape == want.shape == (2, 13, 16, 128)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want), rtol=1e-5, atol=1e-5
    )
    wf = np.asarray(want, np.float32)
    np.testing.assert_allclose(
        np.asarray(ms), wf.sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(mq), (wf * wf).sum(axis=(1, 2)), rtol=1e-4, atol=1e-3
    )


def test_down_fused_prologue_and_exact_tiling():
    """prologue from upstream moments == conv_s2(relu(instance_norm(x))),
    exact-dividing tile."""
    x, kern, bias = _data(h=16, w=32, seed=5)
    xf = np.asarray(x, np.float32)
    ms = jnp.asarray(xf.sum(axis=(1, 2)))
    mq = jnp.asarray((xf * xf).sum(axis=(1, 2)))
    a, b = instance_moments_to_affine(ms, mq, 16 * 32)
    plan = FusedBlockPlan(8, 4, 8, True)
    y, _ = conv3x3s2_fused(
        x, kern, bias, prologue=(a, b), act_pre="relu", plan=plan,
        w_mode="wrap",
    )
    z = jax.nn.relu(instance_norm(x))
    want = _ref_down(z, kern, bias, "wrap")
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_down_fused_bf16_mixed_channels():
    x, kern, bias = _data(h=12, w=16, c=64, cout=128, dtype=jnp.bfloat16,
                          seed=6)
    plan = FusedBlockPlan(6, 2, 6, True)
    y, _ = conv3x3s2_fused(x, kern, bias, plan=plan, w_mode="wrap")
    want = _ref_down(x, kern, bias, "wrap")
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_resnet_generator_fused_updown_matches_default(monkeypatch):
    """Whole-generator equivalence with ALL three fused paths engaged
    (down s2 convs + block chain + up convTs, BIASGAN_FUSED_BLOCK=interpret)
    vs the default XLA path — including the staged pre/blocks/post
    composition infer.py --fused_blocks dispatches."""
    from biasgan_tpu.nn.generators import ResNetGenerator

    g = ResNetGenerator(
        output_nc=3, ngf=8, n_blocks=2, norm_type="instance",
        use_dropout=False, w_mode="wrap", compute_dtype=None,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 32, 3))
    params = g.init(jax.random.PRNGKey(1), x)
    want = g.apply(params, x)

    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")
    monkeypatch.setenv("BIASGAN_FUSED_TH", "2")  # multi-tile + partials
    got = g.apply(params, x)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4
    )
    h = g.apply(params, x, stage="pre")
    h = g.apply(params, h, stage="blocks")
    got_staged = g.apply(params, h, stage="post")
    np.testing.assert_allclose(
        np.asarray(got_staged), np.asarray(want), rtol=2e-4, atol=2e-4
    )


def test_updown_hardware_gate(monkeypatch):
    """On hardware (non-interpret) the down/up paths require the separate
    BIASGAN_FUSED_UPDOWN opt-in — measured r3: they lose to XLA at the
    globe shapes, so BIASGAN_FUSED_BLOCK alone must keep the blocks-only
    optimum."""
    from biasgan_tpu.nn import generators

    g = generators.ResNetGenerator(
        output_nc=3, ngf=64, n_blocks=1, norm_type="instance",
        use_dropout=False, w_mode="wrap",
    )
    x = jnp.zeros((1, 64, 64, 3))
    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "1")
    monkeypatch.setattr(generators.jax, "default_backend", lambda: "tpu")
    assert g._fused_updown_plans(x, False, None, "down") is None
    monkeypatch.setenv("BIASGAN_FUSED_UPDOWN", "1")
    assert g._fused_updown_plans(x, False, None, "down") is not None
    # the block-chain gate is NOT behind the up/down opt-in
    hb = jnp.zeros((1, 16, 16, 256))
    monkeypatch.delenv("BIASGAN_FUSED_UPDOWN")
    assert g._fused_block_plan(hb, False, None) is not None


def test_down_plan_gates():
    assert conv3x3s2_plan(13, 32, 64, 128, jnp.float32) is None   # odd H
    assert conv3x3s2_plan(16, 34, 64, 128, jnp.float32) is None   # W/2 % 8
    p = conv3x3s2_plan(724, 1440, 64, 128, jnp.bfloat16)
    assert p is not None and p.logical_h == 362
