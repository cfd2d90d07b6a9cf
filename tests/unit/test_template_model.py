"""Template (G-only L1 regression) model — the registry extension example."""

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.models.template import TemplateConfig, create_state, make_train_step
from biasgan_tpu.registry import available_models


def _cfg():
    cls = merge_config_cls(TrainConfig, TemplateConfig)
    return cls(
        model="template", netG="unet_d4", norm="instance", no_dropout=True,
        crop_size=32, input_nc=1, output_nc=1, batch_size=4, ngf=8,
        steps_per_epoch=4, checkpoints_dir="/tmp/bgt_tmpl", name="t",
    )


def test_registered():
    assert "template" in available_models()


def test_l1_regression_learns():
    cfg = _cfg()
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    a = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 1))
    batch = {"A": a, "B": jnp.tanh(a)}
    hist = []
    for i in range(12):
        state, losses, vis = step(state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i))
        hist.append(float(losses["G_L1"]))
    assert all(np.isfinite(hist))
    assert hist[-1] < hist[0]  # pure regression must descend on a fixed batch
    assert vis["fake_B"].shape == (4, 32, 32, 1)


def test_diagnostics_utils():
    from biasgan_tpu.utils.diagnostics import (
        assert_finite,
        count_nonfinite,
        diagnose_network,
    )

    cfg = _cfg()
    state = create_state(cfg, jax.random.PRNGKey(0))
    v = diagnose_network(state.nets["G"], "G")
    assert v > 0.0
    assert count_nonfinite(state.nets["G"]["params"]) != {}
    assert_finite(state.nets["G"]["params"])
    bad = {"p": jnp.array([1.0, jnp.nan])}
    import pytest

    with pytest.raises(FloatingPointError):
        assert_finite(bad)
