"""Distributed (virtual 8-device CPU mesh): shard_map data parallelism.

Key test: psum/pmean grad-equivalence — DP training over 8 shards produces
the SAME updated parameters as single-device training on the full batch
(SURVEY.md section 4 item 3). Exact because loss is a batch mean and shards are
equal; instance norm + no dropout + no augmentation keep per-shard stats out
of the picture.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.config import merge_config_cls, TrainConfig
from biasgan_tpu.models.pix2pix import Pix2PixConfig, create_state, make_train_step
from biasgan_tpu.parallel import data_parallel_step, make_mesh, shard_batch

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def cfg_dp(**kw):
    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    base = dict(
        model="pix2pix", netG="unet_d4", netD="basic", norm="instance",
        no_dropout=True, gan_mode="lsgan", crop_size=32, input_nc=1,
        output_nc=1, batch_size=16, ngf=8, ndf=8, steps_per_epoch=2,
        in_graph_aug=False, checkpoints_dir="/tmp/bgt_test_ckpt", name="dp",
    )
    base.update(kw)
    return cls(**base)


def _batch(n=16, hw=32):
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n, hw, hw, 1))
    return {"A": a, "B": jnp.tanh(a * 1.3)}


def test_dp_grad_equivalence():
    """Losses AND post-pmean gradient norms must match single-device training
    on the same global batch. (Param comparison after one Adam step would be
    meaningless: at step 1 Adam reduces to sign(grad), which both amplifies
    1e-7 reduction-order noise into sign flips and is invariant to grad-scale
    bugs — grad norms are the sharp observable: a missing pmean, a psum in
    place of pmean, or a wrong axis each shift them by ~sqrt(8) or 8x.)"""
    cfg = cfg_dp()
    mesh = make_mesh(data=8)
    batch = _batch()
    rng = jax.random.PRNGKey(42)

    state0 = create_state(cfg, jax.random.PRNGKey(1))
    single = jax.jit(make_train_step(cfg, axis_name=None, debug_grad_norms=True))
    _, losses1, _ = single(state0, batch, rng)

    dp = jax.jit(
        data_parallel_step(
            make_train_step(cfg, axis_name="data", debug_grad_norms=True), mesh
        )
    )
    _, losses8, _ = dp(state0, shard_batch(batch, mesh), rng)

    assert {"g_grad_norm", "d_grad_norm"} <= set(losses1)
    for k in losses1:
        np.testing.assert_allclose(
            float(losses1[k]), float(losses8[k]), rtol=2e-4, atol=1e-6,
            err_msg=f"mismatch in {k}",
        )


def test_dp_multiple_steps_stay_replicated():
    cfg = cfg_dp()
    mesh = make_mesh(data=8)
    dp = jax.jit(data_parallel_step(make_train_step(cfg, axis_name="data"), mesh))
    state = create_state(cfg, jax.random.PRNGKey(1))
    rng = jax.random.PRNGKey(0)
    for i in range(3):
        state, losses, _ = dp(state, shard_batch(_batch(), mesh), jax.random.fold_in(rng, i))
    assert all(np.isfinite(float(v)) for v in losses.values())
    # replicated output: every leaf is fully addressable and consistent
    leaf = jax.tree_util.tree_leaves(state.nets)[0]
    shards = [np.asarray(s.data) for s in leaf.addressable_shards]
    for s in shards[1:]:
        np.testing.assert_array_equal(shards[0], s)


def test_dp_batchnorm_runs():
    """Batch-norm DP: per-shard stats are pmean'd; just assert finite+shapes."""
    cfg = cfg_dp(norm="batch", name="dp_bn")
    mesh = make_mesh(data=8)
    dp = jax.jit(data_parallel_step(make_train_step(cfg, axis_name="data"), mesh))
    state = create_state(cfg, jax.random.PRNGKey(1))
    state, losses, vis = dp(state, shard_batch(_batch(), mesh), jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in losses.values())
    assert vis["fake_B"].shape == (16, 32, 32, 1)


def test_dp_cyclegan_with_pool():
    from biasgan_tpu.models.cyclegan import (
        CycleGANConfig, create_state as cg_state, make_train_step as cg_step,
    )

    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    cfg = cls(
        model="cycle_gan", netG="resnet_3blocks", netD="basic", norm="instance",
        no_dropout=True, gan_mode="lsgan", pool_size=4, crop_size=32,
        input_nc=1, output_nc=1, batch_size=16, ngf=8, ndf=8,
        steps_per_epoch=2, checkpoints_dir="/tmp/bgt_test_ckpt", name="dp_cg",
    )
    mesh = make_mesh(data=8)
    dp = jax.jit(data_parallel_step(cg_step(cfg, axis_name="data"), mesh))
    state = cg_state(cfg, jax.random.PRNGKey(0))
    state, losses, _ = dp(state, shard_batch(_batch(16, 32), mesh), jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_cyclegan_pools_replicated_and_match_single_device():
    """Replay pools are REPLICATED state under shard_map (out_specs P());
    the all-gathered pool update must leave every device with the identical
    buffer, equal to the single-device run on the same global batch."""
    import jax.numpy as jnp
    from biasgan_tpu.config import TrainConfig, merge_config_cls
    from biasgan_tpu.models import cyclegan as cg
    from biasgan_tpu.parallel import data_parallel_step, make_mesh, shard_batch

    cls = merge_config_cls(TrainConfig, cg.CycleGANConfig)

    def cfg():
        return cls(
            model="cycle_gan", netG="resnet_2blocks", netD="pixel",
            norm="instance", no_dropout=True, gan_mode="lsgan", pool_size=6,
            crop_size=16, input_nc=1, output_nc=1, batch_size=4, ngf=8,
            ndf=8, steps_per_epoch=4, checkpoints_dir="/tmp/bgt_poolrep",
            name="p",
        )

    rng = jax.random.PRNGKey(0)
    a = jax.random.normal(jax.random.PRNGKey(1), (4, 16, 16, 1))
    batch = {"A": a, "B": jnp.tanh(a)}
    step_rng = jax.random.PRNGKey(2)

    # single device
    state1 = cg.create_state(cfg(), rng)
    step1 = jax.jit(cg.make_train_step(cfg()))
    state1, _, _ = step1(state1, batch, step_rng)

    # 2-way data parallel on the same global batch
    mesh = make_mesh(data=2)
    state2 = cg.create_state(cfg(), rng)
    step2 = jax.jit(
        data_parallel_step(cg.make_train_step(cfg(), axis_name="data"), mesh)
    )
    state2, _, _ = step2(state2, shard_batch(batch, mesh), step_rng)

    buf = state2.pools["fake_B"].buffer
    shards = [np.asarray(s.data) for s in buf.addressable_shards]
    assert len(shards) == 2
    np.testing.assert_array_equal(shards[0], shards[1])  # truly replicated
    np.testing.assert_allclose(
        shards[0], np.asarray(state1.pools["fake_B"].buffer),
        rtol=2e-5, atol=1e-6,
    )
    assert int(state2.pools["fake_B"].count) == int(state1.pools["fake_B"].count)
