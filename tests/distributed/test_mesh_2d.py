"""Distributed: the combined 2-D (data x spatial) mesh (mesh.py combined
branch) — one mesh serves BOTH data-parallel training (over 'data') and
halo-exchanged spatial inference (over 'spatial'), as a production topology
would (e.g. v5e-16 as 2x8). VERDICT r1 item 7.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.config import merge_config_cls, TrainConfig
from biasgan_tpu.models.pix2pix import Pix2PixConfig, create_state, make_train_step
from biasgan_tpu.nn import define_G, init_params
from biasgan_tpu.parallel import (
    data_parallel_step,
    make_mesh,
    shard_batch,
    spatial_apply,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _cfg(**kw):
    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    base = dict(
        model="pix2pix", netG="unet_d4", netD="basic", norm="instance",
        no_dropout=True, gan_mode="lsgan", crop_size=32, input_nc=1,
        output_nc=1, batch_size=8, ngf=8, ndf=8, steps_per_epoch=2,
        in_graph_aug=False, checkpoints_dir="/tmp/bgt_test_ckpt", name="m2d",
    )
    base.update(kw)
    return cls(**base)


def test_mesh_2d_shape_and_axes():
    mesh = make_mesh(data=2, spatial=4)
    assert mesh.shape == {"data": 2, "spatial": 4}


def test_dp_train_on_2d_mesh_matches_single_device():
    """Training over the 'data' axis of a 2x4 mesh (batch replicated along
    'spatial') must produce the same losses/grad norms as single device."""
    cfg = _cfg()
    mesh = make_mesh(data=2, spatial=4)
    a = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 32, 1))
    batch = {"A": a, "B": jnp.tanh(a * 1.3)}
    rng = jax.random.PRNGKey(42)

    state0 = create_state(cfg, jax.random.PRNGKey(1))
    single = jax.jit(make_train_step(cfg, axis_name=None, debug_grad_norms=True))
    _, losses1, _ = single(state0, batch, rng)

    dp = jax.jit(
        data_parallel_step(
            make_train_step(cfg, axis_name="data", debug_grad_norms=True), mesh
        )
    )
    _, losses2, _ = dp(state0, shard_batch(batch, mesh), rng)

    for k in losses1:
        np.testing.assert_allclose(
            float(losses1[k]), float(losses2[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"mismatch in {k}",
        )


def test_spatial_inference_on_2d_mesh_matches_whole_field():
    """Halo-sharded forward over the 'spatial' axis of the SAME 2x4 mesh
    equals the whole-field forward."""
    G = define_G("resnet_3blocks", output_nc=1, ngf=8, norm="instance",
                 w_mode="wrap")
    x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 32, 1))
    v = init_params(G, jax.random.PRNGKey(4), x)
    mesh = make_mesh(data=2, spatial=4)

    whole = G.apply(v, x, False)
    sharded = jax.jit(spatial_apply(G, mesh, train=False, periodic=True))(v, x)
    np.testing.assert_allclose(
        np.asarray(whole), np.asarray(sharded), rtol=2e-5, atol=2e-5
    )


def test_train_and_infer_share_one_2d_mesh():
    """Full round: a DP train step, then sharded inference with the trained
    G params, all on one mesh — finite losses, correct output shape."""
    cfg = _cfg(netG="resnet_2blocks")
    mesh = make_mesh(data=2, spatial=4)
    a = jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 1))
    state = create_state(cfg, jax.random.PRNGKey(6))
    dp = jax.jit(data_parallel_step(make_train_step(cfg, axis_name="data"), mesh))
    state, losses, _ = dp(
        state, shard_batch({"A": a, "B": jnp.tanh(a)}, mesh), jax.random.PRNGKey(7)
    )
    assert all(np.isfinite(float(v)) for v in losses.values())

    G = define_G("resnet_2blocks", output_nc=1, ngf=8, norm="instance",
                 use_dropout=False, w_mode="wrap")
    fwd = jax.jit(spatial_apply(G, mesh, train=False, periodic=True))
    y = fwd(state.nets["G"], a[:1])
    assert y.shape == (1, 32, 32, 1)
    assert bool(jnp.all(jnp.isfinite(y)))
