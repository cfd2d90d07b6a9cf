"""TestModel: G-only inference wrapper, including --model_suffix extraction
of one CycleGAN direction (reference models/test_model.py semantics)."""

import jax
import numpy as np
import pytest

from biasgan_tpu.config import parse_config
from biasgan_tpu.models import create_model
from biasgan_tpu.models.cyclegan import CycleGANConfig, create_state
from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.utils import checkpoint as ckpt


def test_model_suffix_loads_cyclegan_direction(tmp_path):
    # save a CycleGAN checkpoint (4 nets)
    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    ccfg = cls(
        model="cycle_gan", netG="resnet_3blocks", norm="instance",
        no_dropout=True, crop_size=32, input_nc=1, output_nc=1,
        batch_size=1, ngf=8, ndf=8, pool_size=0, steps_per_epoch=1,
        checkpoints_dir=str(tmp_path), name="cyc",
    )
    state = create_state(ccfg, jax.random.PRNGKey(0))
    run_dir = ccfg.run_dir()
    ckpt.save_state(run_dir, "latest", state, block=True)

    # TestModel with --model_suffix _A picks G_A out of it
    tcfg = parse_config(
        [
            "--model", "test", "--dataset_mode", "single",
            "--dataroot", str(tmp_path),  # unused before set_input
            "--netG", "resnet_3blocks", "--norm", "instance", "--no_dropout",
            "--crop_size", "32", "--input_nc", "1", "--output_nc", "1",
            "--ngf", "8", "--model_suffix", "_A",
            "--checkpoints_dir", str(tmp_path), "--name", "cyc",
        ],
        train=False,
    )
    model = create_model(tcfg)
    model.load_networks("latest")
    # loaded params must equal the CycleGAN G_A params
    a = np.asarray(
        jax.tree_util.tree_leaves(model.state.nets["G"]["params"])[0]
    )
    b = np.asarray(jax.tree_util.tree_leaves(state.nets["G_A"]["params"])[0])
    np.testing.assert_array_equal(a, b)

    model.set_input({"A": np.zeros((1, 32, 32, 1), np.float32), "A_paths": ["x"]})
    model.test()
    out = model.get_current_visuals()
    assert out["fake"].shape == (1, 32, 32, 1)
    assert np.isfinite(out["fake"]).all()


def test_model_suffix_unknown_net(tmp_path):
    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    ccfg = cls(
        model="cycle_gan", netG="resnet_3blocks", norm="instance",
        no_dropout=True, crop_size=32, input_nc=1, output_nc=1,
        batch_size=1, ngf=8, ndf=8, pool_size=0, steps_per_epoch=1,
        checkpoints_dir=str(tmp_path), name="cyc2",
    )
    state = create_state(ccfg, jax.random.PRNGKey(0))
    ckpt.save_state(ccfg.run_dir(), "latest", state, block=True)
    tcfg = parse_config(
        [
            "--model", "test", "--dataset_mode", "single",
            "--netG", "resnet_3blocks", "--norm", "instance", "--no_dropout",
            "--crop_size", "32", "--input_nc", "1", "--output_nc", "1",
            "--ngf", "8", "--model_suffix", "_Z",
            "--checkpoints_dir", str(tmp_path), "--name", "cyc2",
        ],
        train=False,
    )
    model = create_model(tcfg)
    with pytest.raises(KeyError, match="model_suffix"):
        model.load_networks("latest")
