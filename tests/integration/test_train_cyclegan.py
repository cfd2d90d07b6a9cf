"""Integration: CycleGAN tiny config (judged config BASELINE.json line 9 at
reduced size) — dual G/D, cycle + identity losses, in-graph ImagePool."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.config import merge_config_cls, TrainConfig
from biasgan_tpu.data import create_dataset
from biasgan_tpu.data.synthetic import SyntheticConfig
from biasgan_tpu.models.cyclegan import CycleGANConfig, create_state, make_train_step


def tiny_cfg(**kw):
    cls = merge_config_cls(TrainConfig, CycleGANConfig, SyntheticConfig)
    base = dict(
        model="cycle_gan", dataset_mode="synthetic", netG="resnet_3blocks",
        netD="basic", norm="instance", no_dropout=True, gan_mode="lsgan",
        pool_size=8, crop_size=32, input_nc=1, output_nc=1, batch_size=2,
        ngf=8, ndf=8, synthetic_samples=8, steps_per_epoch=4,
        checkpoints_dir="/tmp/bgt_test_ckpt", name="it_cyclegan",
    )
    base.update(kw)
    return cls(**base)


@pytest.fixture(scope="module")
def trained():
    cfg = tiny_cfg()
    loader = create_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(1)
    history = []
    for epoch in range(2):
        for i, batch in enumerate(loader):
            b = {k: jnp.asarray(v) for k, v in batch.items() if not k.endswith("_paths")}
            state, losses, visuals = step(state, b, jax.random.fold_in(rng, epoch * 100 + i))
            history.append({k: float(v) for k, v in losses.items()})
    return cfg, state, history, visuals


def test_loss_names(trained):
    _, _, history, _ = trained
    assert set(history[0]) == {
        "D_A", "G_A", "cycle_A", "idt_A", "D_B", "G_B", "cycle_B", "idt_B"
    }


def test_losses_finite(trained):
    _, _, history, _ = trained
    for h in history:
        for k, v in h.items():
            assert np.isfinite(v), f"{k} non-finite"


def test_cycle_loss_decreases(trained):
    _, _, history, _ = trained
    first = np.mean([h["cycle_A"] + h["cycle_B"] for h in history[:2]])
    last = np.mean([h["cycle_A"] + h["cycle_B"] for h in history[-2:]])
    assert last < first


def test_pool_fills(trained):
    _, state, history, _ = trained
    expect = min(8, 2 * len(history))
    assert int(state.pools["fake_B"].count) == expect
    assert int(state.pools["fake_A"].count) == expect


def test_visuals(trained):
    _, _, _, visuals = trained
    assert set(visuals) == {"real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B"}
    assert visuals["rec_A"].shape == (2, 32, 32, 1)


def test_identity_off_skips_idt_losses():
    cfg = tiny_cfg(lambda_identity=0.0, name="it_cyclegan_noidt")
    loader = create_dataset(cfg)
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    batch = next(iter(loader))
    b = {k: jnp.asarray(v) for k, v in batch.items() if not k.endswith("_paths")}
    state, losses, _ = step(state, b, jax.random.PRNGKey(2))
    assert float(losses["idt_A"]) == 0.0 and float(losses["idt_B"]) == 0.0
