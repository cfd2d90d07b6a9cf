"""The batched (3-dispatch) CycleGAN G forward is semantically exact.

The reference runs 6 separate generator passes per step (fake_B, rec_A,
fake_A, rec_B, idt_A, idt_B — SURVEY.md section 3.2). Our train step
restructures them into 3 batched dispatches when the norm is per-sample
(instance/none). These tests assert the fused and unfused paths produce the
same losses AND the same gradients at identical parameters — i.e. the
restructure is a pure performance transform, not a semantics change.

(Comparing post-update params instead would be meaningless: Adam's
bias-corrected first step is ~lr * sign(grad) elementwise, so float-level
grad noise flips near-zero components by 2*lr.)
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.config import merge_config_cls, TrainConfig
from biasgan_tpu.models.cyclegan import CycleGANConfig, create_state, make_train_step


def tiny_cfg(**kw):
    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    base = dict(
        model="cycle_gan", netG="resnet_3blocks", netD="basic",
        norm="instance", no_dropout=True, gan_mode="lsgan", pool_size=4,
        crop_size=32, input_nc=1, output_nc=1, batch_size=2, ngf=8, ndf=8,
        steps_per_epoch=4, checkpoints_dir="/tmp/bgt_test_ckpt",
        name="ut_cg_fused",
    )
    base.update(kw)
    return cls(**base)


def _batch(cfg, seed=7):
    k = jax.random.PRNGKey(seed)
    ka, kb = jax.random.split(k)
    shape = (cfg.batch_size, cfg.crop_size, cfg.crop_size, cfg.input_nc)
    return {
        "A": jax.random.normal(ka, shape),
        "B": jax.random.normal(kb, shape),
    }


def _one_step(cfg, fuse_g):
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg, fuse_g=fuse_g, debug_grads=True))
    _, losses, visuals = step(state, _batch(cfg), jax.random.PRNGKey(1))
    return (
        {k: float(v) for k, v in losses.items()},
        visuals["_g_grads"],
        visuals["_d_grads"],
        {k: v for k, v in visuals.items() if not k.startswith("_")},
    )


def _assert_trees_close(got, want, rtol, atol, what):
    flat_want = dict(jax.tree_util.tree_leaves_with_path(want))
    for path, leaf in jax.tree_util.tree_leaves_with_path(got):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_want[path]), rtol=rtol, atol=atol,
            err_msg=f"{what}{jax.tree_util.keystr(path)}",
        )


@pytest.mark.parametrize("lam_idt", [0.5, 0.0])
def test_fused_matches_unfused(lam_idt):
    cfg = tiny_cfg(lambda_identity=lam_idt)
    lf, ggf, dgf, vf = _one_step(cfg, fuse_g=True)
    lp, ggp, dgp, vp = _one_step(cfg, fuse_g=False)
    for k in lp:
        np.testing.assert_allclose(lf[k], lp[k], rtol=1e-4, atol=1e-6, err_msg=k)
    _assert_trees_close(vf, vp, 1e-4, 1e-5, "visual:")
    _assert_trees_close(ggf, ggp, 2e-3, 1e-5, "g_grad:")
    _assert_trees_close(dgf, dgp, 2e-3, 1e-5, "d_grad:")


def test_batch_norm_keeps_reference_path():
    """fuse_g defaults off for batch norm (per-pass statistics differ)."""
    cfg = tiny_cfg(norm="batch")
    la, gga, dga, _ = _one_step(cfg, fuse_g=None)  # auto -> unfused
    lp, ggp, dgp, _ = _one_step(cfg, fuse_g=False)
    for k in lp:
        np.testing.assert_allclose(la[k], lp[k], rtol=1e-6, err_msg=k)
    _assert_trees_close(gga, ggp, 1e-6, 0, "g_grad:")
