"""LR schedule policies (models/common.py make_lr_schedule) vs the
reference's torch get_scheduler semantics (models/networks.py [K]):

  linear : lr constant for n_epochs, then linearly to 0 over n_epochs_decay
  step   : lr * 0.1^(epoch // lr_decay_iters)
  cosine : 0.5 * (1 + cos(pi * epoch / n_epochs)) * lr
  plateau: host-driven lr_scale (ReduceLROnPlateau factor 0.2 patience 5)
"""

import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.models.common import make_lr_schedule
from biasgan_tpu.models.pix2pix import Pix2PixConfig


def _cfg(**kw):
    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    base = dict(
        model="pix2pix", lr=2e-4, n_epochs=5, n_epochs_decay=5, epoch_count=1,
        steps_per_epoch=10, checkpoints_dir="/tmp/x", name="x",
    )
    base.update(kw)
    return cls(**base)


def _lr_at_epoch(fn, e, spe=10):
    return float(fn(jnp.asarray(e * spe, jnp.int32), jnp.ones(())))


def test_linear_matches_reference_lambda():
    cfg = _cfg(lr_policy="linear")
    fn = make_lr_schedule(cfg)
    # reference lambda: 1 - max(0, epoch + epoch_count - n_epochs) / (n_epochs_decay + 1)
    for e in range(11):
        torch_epoch = e  # scheduler.step() count
        expect = 2e-4 * (1.0 - max(0, torch_epoch + 1 - 5) / 6.0)
        np.testing.assert_allclose(_lr_at_epoch(fn, e), expect, rtol=1e-6)
    # constant through the first n_epochs, ~0 at the very end
    assert _lr_at_epoch(fn, 0) == _lr_at_epoch(fn, 3)
    assert _lr_at_epoch(fn, 10) < 2e-5


def test_step_policy():
    cfg = _cfg(lr_policy="step", lr_decay_iters=3)
    fn = make_lr_schedule(cfg)
    np.testing.assert_allclose(_lr_at_epoch(fn, 0), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(_lr_at_epoch(fn, 3), 2e-5, rtol=1e-6)
    np.testing.assert_allclose(_lr_at_epoch(fn, 6), 2e-6, rtol=1e-6)


def test_cosine_policy():
    cfg = _cfg(lr_policy="cosine")
    fn = make_lr_schedule(cfg)
    np.testing.assert_allclose(_lr_at_epoch(fn, 0), 2e-4, rtol=1e-6)
    np.testing.assert_allclose(
        _lr_at_epoch(fn, 5), 2e-4 * 0.5 * (1 + np.cos(np.pi)), atol=1e-12
    )


def test_plateau_host_scale():
    cfg = _cfg(lr_policy="plateau")
    fn = make_lr_schedule(cfg)
    full = float(fn(jnp.asarray(0, jnp.int32), jnp.ones(())))
    fifth = float(fn(jnp.asarray(0, jnp.int32), jnp.asarray(0.2)))
    np.testing.assert_allclose(fifth, full * 0.2, rtol=1e-6)


def test_plateau_model_hook(tmp_path):
    """BaseModel.update_learning_rate('plateau') mirrors ReduceLROnPlateau:
    no improvement for >5 epochs -> lr_scale *= 0.2."""
    from biasgan_tpu.models import create_model
    from biasgan_tpu.config import parse_config

    cfg = parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "synthetic",
            "--netG", "unet_d4", "--crop_size", "32", "--input_nc", "1",
            "--output_nc", "1", "--ngf", "8", "--ndf", "8",
            "--lr_policy", "plateau",
            "--checkpoints_dir", str(tmp_path), "--name", "pl",
        ],
        train=True,
    )
    cfg.steps_per_epoch = 1
    model = create_model(cfg)
    model.update_learning_rate(metric=1.0)  # sets best
    for _ in range(6):  # 6 bad epochs > patience 5
        model.update_learning_rate(metric=2.0)
    assert float(model.state.lr_scale) == pytest.approx(0.2)
