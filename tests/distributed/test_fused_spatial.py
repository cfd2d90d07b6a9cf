"""--fused_blocks x --spatial_mesh composition (VERDICT r3 item 3): the
fused resnet-block kernels run per-shard with halo-exchanged SAME-pad
columns (conv3x3_fused w_mode='halo') and W-globally psum'd instance-norm
moments, inside one spatial_apply shard_map — and the result equals the
UNFUSED whole-field forward to float tolerance, the same invariant the
plain spatial path holds (tests/distributed/test_spatial.py)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.nn import define_G, init_params
from biasgan_tpu.parallel import make_mesh, spatial_apply
from biasgan_tpu.parallel.spatial import HaloCtx

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)

RNG = jax.random.PRNGKey(0)


def _field(h, w, c=1, key=3):
    return jax.random.normal(jax.random.PRNGKey(key), (1, h, w, c))


@pytest.fixture
def fused_env(monkeypatch):
    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")


@pytest.mark.parametrize(
    "n_shards,periodic,hw",
    [(4, True, 128), (2, False, 64), (8, True, 256)],
)
def test_fused_sharded_equals_unfused_whole_field(
    fused_env, monkeypatch, n_shards, periodic, hw
):
    # block-resolution local width must be 8-aligned:
    # hw / 4 / n_shards % 8 == 0 for every case above
    assert hw // 4 // n_shards % 8 == 0
    w_mode = "wrap" if periodic else "zero"
    G = define_G("resnet_3blocks", output_nc=1, ngf=8, norm="instance",
                 w_mode=w_mode)
    x = _field(hw, hw)
    v = init_params(G, RNG, x)

    # reference: UNFUSED whole-field forward (env cleared for this trace)
    monkeypatch.delenv("BIASGAN_FUSED_BLOCK")
    whole = np.asarray(G.apply(v, x, False))
    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")

    mesh = make_mesh(data=1, spatial=n_shards)
    fwd = jax.jit(spatial_apply(G, mesh, train=False, periodic=periodic))
    sharded = np.asarray(fwd(v, x))
    np.testing.assert_allclose(sharded, whole, rtol=1e-4, atol=1e-5)


def test_fused_block_engages_under_ctx(fused_env):
    """The gate must actually pick the fused path under a HaloCtx (guards
    against a silent fallback that would make the equivalence test above
    vacuously pass on the plain path)."""
    from biasgan_tpu.nn.generators import ResNetGenerator

    G = ResNetGenerator(output_nc=1, ngf=8, n_blocks=3, norm_type="instance",
                        w_mode="wrap")
    ctx = HaloCtx("spatial", 4, periodic=True)
    h = jnp.zeros((1, 16, 32, 32))
    plan = G._fused_block_plan(h, train=False, ctx=ctx)
    assert plan is not None and plan.interpret
    # ineligible local width (not 8-aligned) falls back cleanly
    assert G._fused_block_plan(jnp.zeros((1, 16, 12, 32)), False, ctx) is None
    # training falls back unless the BIASGAN_FUSED_TRAIN opt-in is set
    # (train.py --fused_blocks; conv3x3_fused_t custom-VJP path)
    assert G._fused_block_plan(h, train=True, ctx=ctx) is None


def test_fused_spatial_train_grads_match_whole_field(fused_env, monkeypatch):
    """Spatially-sharded fused TRAINING: grads of the halo-composed fused
    forward (conv3x3_fused_t w_mode='halo' + psum'd moments under
    shard_map) must equal the whole-field unfused train-mode grads — the
    halo columns' cotangents ride back through embed_halo_w's pad adjoint
    and HaloCtx.pad_w's reverse ppermute."""
    G = define_G("resnet_3blocks", output_nc=1, ngf=8, norm="instance",
                 w_mode="wrap")
    hw = 64
    x = _field(hw, hw)
    v = init_params(G, RNG, x)
    gy = jax.random.normal(jax.random.PRNGKey(7), x.shape)

    monkeypatch.delenv("BIASGAN_FUSED_BLOCK")

    def loss_whole(v, x):
        return jnp.sum(G.apply(v, x, True) * gy)

    want_v, want_g = jax.value_and_grad(loss_whole, argnums=(0, 1))(v, x)

    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_TRAIN", "1")
    mesh = make_mesh(data=1, spatial=2)
    fwd = spatial_apply(G, mesh, train=True, periodic=True)

    def loss_sharded(v, x):
        return jnp.sum(fwd(v, x) * gy)

    got_v, got_g = jax.jit(
        jax.value_and_grad(loss_sharded, argnums=(0, 1))
    )(v, x)

    np.testing.assert_allclose(got_v, want_v, rtol=1e-4, atol=1e-4)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want_g)
    flat_g = jax.tree_util.tree_leaves(got_g)
    assert len(flat_w) == len(flat_g)
    for (path, wv), gv in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=2e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_fused_spatial_moments_are_global(fused_env, monkeypatch):
    """Cross-check the W-global normalization: make the field's statistics
    strongly W-dependent (a longitude ramp); per-shard moments would give a
    visibly different output than global ones."""
    G = define_G("resnet_3blocks", output_nc=1, ngf=8, norm="instance",
                 w_mode="wrap")
    hw = 128
    ramp = jnp.linspace(-3.0, 3.0, hw)[None, None, :, None]
    x = _field(hw, hw) + ramp.astype(jnp.float32) * 2.0
    v = init_params(G, RNG, x)

    monkeypatch.delenv("BIASGAN_FUSED_BLOCK")
    whole = np.asarray(G.apply(v, x, False))
    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")

    mesh = make_mesh(data=1, spatial=4)
    fwd = jax.jit(spatial_apply(G, mesh, train=False, periodic=True))
    sharded = np.asarray(fwd(v, x))
    np.testing.assert_allclose(sharded, whole, rtol=1e-4, atol=1e-5)
