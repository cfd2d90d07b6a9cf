"""conv3x3_fused w_mode='halo' (the spatial-sharding composition,
VERDICT r3 item 3): a pre-padded input whose SAME-pad columns were supplied
by the caller (halo exchange) must compute exactly what the in-kernel pad
modes compute when the supplied columns equal the wrap/zero synthesis —
the single-shard algebraic identity that makes the multi-shard composition
(tests/distributed/test_fused_spatial.py) exact."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.ops.pallas_conv import (
    conv3x3_fused,
    embed_halo_w,
    fused_block_plan,
    instance_moments_to_affine,
)


def _data(n=2, h=13, w=16, c=128, seed=0, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    x = jax.random.normal(k1, (n, h, w, c), dtype)
    kern = (jax.random.normal(k2, (3, 3, c, c)) * 0.05).astype(dtype)
    bias = jax.random.normal(k3, (c,), jnp.float32) * 0.1
    return x, kern, bias


def _hrun_pad(x, plan):
    n, h, w, c = x.shape
    if plan.h_run > h:
        tail = jnp.full((n, plan.h_run - h, w, c), 7.75, x.dtype)
        return jnp.concatenate([x, tail], axis=1)
    return x


def _halo_input(x, plan, mode):
    """Build the embed_halo_w layout with wrap or zero halo columns — what
    HaloCtx.pad_w would deliver on 1 shard (periodic / global-edge)."""
    if mode == "wrap":
        xp = jnp.concatenate([x[:, :, -1:], x, x[:, :, :1]], axis=2)
    else:
        z = jnp.zeros_like(x[:, :, :1])
        xp = jnp.concatenate([z, x, z], axis=2)
    return _hrun_pad(embed_halo_w(xp), plan)


@pytest.mark.parametrize("mode", ["wrap", "zero"])
@pytest.mark.parametrize("h_mode", ["reflect", "zero"])
def test_halo_mode_equals_inkernel_pad(mode, h_mode):
    x, kern, bias = _data()
    n, h, w, c = x.shape
    plan = fused_block_plan(h, w, c, c, x.dtype, interpret=True)
    assert plan is not None

    y_ref, m_ref = conv3x3_fused(
        _hrun_pad(x, plan), kern, bias, plan=plan, h_mode=h_mode,
        w_mode=mode, want_moments=True,
    )
    y_halo, m_halo = conv3x3_fused(
        _halo_input(x, plan, mode), kern, bias, plan=plan, h_mode=h_mode,
        w_mode="halo", want_moments=True,
    )
    np.testing.assert_array_equal(
        np.asarray(y_halo[:, :h]), np.asarray(y_ref[:, :h])
    )
    for a, b in zip(m_halo, m_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_halo_mode_prologue_applies_to_halo_columns():
    """The in-kernel prologue (instance-norm affine + ReLU) must transform
    the halo columns identically to the data columns — the property that
    lets shards exchange RAW conv outputs and normalize in-kernel with the
    psum'd global affine."""
    x, kern, bias = _data(seed=1)
    n, h, w, c = x.shape
    plan = fused_block_plan(h, w, c, c, x.dtype, interpret=True)

    y0, m0 = conv3x3_fused(
        _hrun_pad(x, plan), kern, bias, plan=plan, h_mode="reflect",
        w_mode="wrap", want_moments=True,
    )
    a0, b0 = instance_moments_to_affine(*m0, h * w)

    y1_ref, m1_ref = conv3x3_fused(
        y0, kern, bias, prologue=(a0, b0), act_pre="relu", plan=plan,
        h_mode="reflect", w_mode="wrap", want_moments=True,
    )
    # halo path: exchange y0's raw edge columns (wrap), then prologue
    # in-kernel. y0's tail rows are already the kernel's garbage rows;
    # rebuild the halo layout from the LOGICAL rows only.
    y1_halo, m1_halo = conv3x3_fused(
        _halo_input(y0[:, :h], plan, "wrap"), kern, bias,
        prologue=(a0, b0), act_pre="relu", plan=plan, h_mode="reflect",
        w_mode="halo", want_moments=True,
    )
    np.testing.assert_array_equal(
        np.asarray(y1_halo[:, :h]), np.asarray(y1_ref[:, :h])
    )
    for a, b in zip(m1_halo, m1_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_halo_mode_narrow_width_guard():
    x, kern, bias = _data(w=16)
    plan = fused_block_plan(13, 16, 128, 128, x.dtype, interpret=True)
    bad = jnp.zeros((2, plan.h_run, 16, 128))  # w+16 would imply w=0
    with pytest.raises(AssertionError):
        conv3x3_fused(bad, kern, bias, plan=plan, w_mode="halo")
