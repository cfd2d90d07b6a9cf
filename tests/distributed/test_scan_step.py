"""Multi-step device loop (make_scan_step): k scanned steps must equal k
sequential host dispatches bitwise (same rng folding), alone and composed
with data-parallel shard_map (scan inside, grads pmean'd every step)."""

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.models.common import make_scan_step, stack_batches
from biasgan_tpu.models.pix2pix import Pix2PixConfig, create_state, make_train_step
from biasgan_tpu.parallel import data_parallel_step, make_mesh, shard_batch

K = 3


def _cfg(batch, axis=False):
    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    return cls(
        model="pix2pix", netG="unet_d4", netD="basic", norm="instance",
        no_dropout=True, gan_mode="lsgan", pool_size=0,
        crop_size=32, input_nc=1, output_nc=1, batch_size=batch,
        ngf=8, ndf=8, steps_per_epoch=8,
        checkpoints_dir="/tmp/bgt_scan", name="scan",
    )


def _batches(k, batch):
    out = []
    for i in range(k):
        a = jax.random.normal(jax.random.PRNGKey(10 + i), (batch, 32, 32, 1))
        out.append({"A": np.asarray(a), "B": np.asarray(jnp.tanh(a))})
    return out


def test_scan_equals_host_loop():
    cfg = _cfg(2)
    state0 = create_state(cfg, jax.random.PRNGKey(0))
    step = make_train_step(cfg)
    rng = jax.random.PRNGKey(7)
    batches = _batches(K, 2)

    # host loop with the scan's rng folding
    st = state0
    for i, b in enumerate(batches):
        st, losses_h, _ = jax.jit(step)(
            st, {k: jnp.asarray(v) for k, v in b.items()}, jax.random.fold_in(rng, i)
        )

    scan = jax.jit(make_scan_step(step, K))
    stacked = {k: jnp.asarray(v) for k, v in stack_batches(batches).items()}
    st_s, losses_k, visuals = scan(state0, stacked, rng)

    for k_, v in losses_k.items():
        assert v.shape == (K,)
        assert np.isfinite(np.asarray(v)).all()
    np.testing.assert_allclose(
        float(losses_k["G_L1"][-1]), float(losses_h["G_L1"]), rtol=1e-6
    )
    # scan and unrolled dispatches are different XLA programs; fusion order
    # differs in the last ulp, so tight-tolerance equality (not bitwise)
    a = jax.tree_util.tree_leaves(st.nets["G"]["params"])[0]
    b = jax.tree_util.tree_leaves(st_s.nets["G"]["params"])[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=1e-7)
    assert int(st_s.step) == K
    assert visuals["fake_B"].shape == (2, 32, 32, 1)  # last step only


def test_scan_composes_with_data_parallel():
    cfg = _cfg(4)
    mesh = make_mesh(data=2)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = data_parallel_step(
        make_scan_step(make_train_step(cfg, axis_name="data"), K), mesh, batch_axis=1
    )
    stacked = stack_batches(_batches(K, 4))
    stacked = shard_batch(stacked, mesh, batch_axis=1)
    st, losses_k, visuals = jax.jit(step)(state, stacked, jax.random.PRNGKey(7))
    assert int(st.step) == K
    for v in losses_k.values():
        assert v.shape == (K,) and np.isfinite(np.asarray(v)).all()
    assert visuals["fake_B"].shape == (4, 32, 32, 1)


def test_scan_carries_cyclegan_pools():
    """The replay pools (stateful pytree in GANTrainState) must thread
    through the lax.scan device loop: after k scanned steps the pool has
    absorbed k batches of fakes, same as k host dispatches."""
    from biasgan_tpu.models import cyclegan as cg

    ccls = merge_config_cls(TrainConfig, cg.CycleGANConfig)
    cfg = ccls(
        model="cycle_gan", netG="resnet_2blocks", netD="pixel",
        norm="instance", no_dropout=True, gan_mode="lsgan", pool_size=16,
        crop_size=16, input_nc=1, output_nc=1, batch_size=2, ngf=8, ndf=8,
        steps_per_epoch=4, checkpoints_dir="/tmp/bgt_scanpool", name="sp",
    )
    state = cg.create_state(cfg, jax.random.PRNGKey(0))
    step = cg.make_train_step(cfg)
    scan = jax.jit(make_scan_step(step, K))
    batches16 = []
    for i in range(K):
        a = jax.random.normal(jax.random.PRNGKey(20 + i), (2, 16, 16, 1))
        batches16.append({"A": np.asarray(a), "B": np.asarray(jnp.tanh(a))})
    stacked = stack_batches(batches16)
    st, losses_k, _ = scan(state, {k: jnp.asarray(v) for k, v in stacked.items()},
                           jax.random.PRNGKey(3))
    assert int(st.step) == K
    # pool not yet full: every scanned step stored its whole batch
    assert int(st.pools["fake_B"].count) == K * 2
    assert int(st.pools["fake_A"].count) == K * 2
    for v in losses_k.values():
        assert v.shape == (K,) and np.isfinite(np.asarray(v)).all()
