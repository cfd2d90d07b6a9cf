"""Reference object-API surface (BaseModel wrapper): create_model ->
set_input / optimize_parameters / get_current_losses / get_current_visuals /
test / eval / save_networks / load_networks / update_learning_rate — the
contract a user of the reference framework relies on (SURVEY.md section 2.2
BaseModel row). Also covers the wgangp gan_mode at the full-step level."""

import numpy as np
import pytest

from biasgan_tpu.config import parse_config
from biasgan_tpu.data import create_dataset
from biasgan_tpu.models import create_model


def _cfg(tmp, extra=None, train=True):
    phase = ["--phase", "train"] if train else []
    return parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "synthetic",
            "--netG", "unet_d4", "--crop_size", "32", "--input_nc", "1",
            "--output_nc", "1", "--batch_size", "2", "--ngf", "8", "--ndf", "8",
            "--synthetic_samples", "4", "--norm", "instance",
            "--checkpoints_dir", str(tmp), "--name", "api",
        ]
        + phase
        + (extra or []),
        train=train,
    )


def test_reference_api_roundtrip(tmp_path):
    cfg = _cfg(tmp_path)
    loader = create_dataset(cfg)
    cfg.steps_per_epoch = len(loader)
    model = create_model(cfg)
    model.setup()

    batch = next(iter(loader))
    model.set_input(batch)
    model.optimize_parameters()
    losses = model.get_current_losses()
    assert set(losses) == {"G_GAN", "G_L1", "D_real", "D_fake"}
    assert all(np.isfinite(v) for v in losses.values())

    visuals = model.get_current_visuals()
    assert set(visuals) == {"real_A", "fake_B", "real_B"}
    assert visuals["fake_B"].shape == (2, 32, 32, 1)
    assert model.get_image_paths()  # synthetic paths carried through

    lr0 = model.current_lr()
    model.update_learning_rate()
    assert model.current_lr() <= lr0 + 1e-12

    model.save_networks("latest")

    # a fresh test-phase model restores and runs no-grad inference
    tcfg = _cfg(tmp_path, train=False)
    tmodel = create_model(tcfg)
    tmodel.setup()
    tmodel.eval()
    tmodel.set_input(batch)
    tmodel.test()
    out = tmodel.get_current_visuals()
    assert out["fake_B"].shape == (2, 32, 32, 1)
    assert np.isfinite(out["fake_B"]).all()


def test_wgangp_full_step(tmp_path):
    """wgangp mode: gradient penalty runs inside the jitted step and the
    D losses carry the WGAN signs."""
    cfg = _cfg(tmp_path, ["--gan_mode", "wgangp", "--name", "wgp"])
    loader = create_dataset(cfg)
    cfg.steps_per_epoch = len(loader)
    model = create_model(cfg)
    batch = next(iter(loader))
    model.set_input(batch)
    for _ in range(3):
        model.optimize_parameters()
    losses = model.get_current_losses()
    assert all(np.isfinite(v) for v in losses.values()), losses


def test_wgangp_grad_of_grad_through_tiny_cin_vjp(tmp_path, monkeypatch):
    """The gradient penalty differentiates THROUGH the inner D-input
    gradient — grad-of-grad. At production sizes (M >= 64k) the D stem's
    conv runs the _conv_tiny_cin custom VJP (nn/layers.py), whose bwd is
    plain conv ops, so second-order autodiff must trace AND match the
    plain-autodiff path. Forces the M gate open (BIASGAN_S2D_MIN_M=1) so
    the tiny test config exercises the same code a 256^2 wgangp run hits
    (r2 advisor: this path was never exercised below the gate)."""
    import jax
    import jax.numpy as jnp

    from biasgan_tpu.models.pix2pix import create_state, make_train_step

    cfg = _cfg(tmp_path, ["--gan_mode", "wgangp", "--name", "wgp2"])
    cfg.steps_per_epoch = 4
    a = np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    )
    batch = {"A": jnp.asarray(a), "B": jnp.tanh(jnp.asarray(a))}
    rng = jax.random.PRNGKey(2)
    state0 = create_state(cfg, jax.random.PRNGKey(0))

    # reference: custom VJP disabled (plain autodiff through the stem conv)
    monkeypatch.setenv("BIASGAN_NO_TINY_CIN_VJP", "1")
    monkeypatch.setenv("BIASGAN_S2D_MIN_M", "1")
    monkeypatch.setenv("BIASGAN_S2D_MAX_COUT", "0")
    s_ref, l_ref, _ = jax.jit(make_train_step(cfg))(state0, batch, rng)

    # the production path: tiny-cin custom VJP engaged (fresh jit = fresh
    # trace reads the new env)
    monkeypatch.setenv("BIASGAN_NO_TINY_CIN_VJP", "0")
    monkeypatch.setenv("BIASGAN_S2D_MAX_COUT", "8")
    s_vjp, l_vjp, _ = jax.jit(make_train_step(cfg))(state0, batch, rng)

    for k in l_ref:
        np.testing.assert_allclose(
            float(l_vjp[k]), float(l_ref[k]), rtol=2e-4, atol=2e-4, err_msg=k
        )
    ref_leaves = jax.tree_util.tree_leaves(s_ref.nets)
    vjp_leaves = jax.tree_util.tree_leaves(s_vjp.nets)
    for x, y in zip(ref_leaves, vjp_leaves):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=1.5e-3
        )


def test_phase_train_at_test_time_builds_no_train_step(tmp_path):
    """Reference semantics: `test.py --phase train` applies G to the
    TRAINING split. is_train must follow the config CLASS (TestConfig), not
    the phase string — a test-parsed config with phase=train must not try
    to build a train step (TestConfig has no optimizer fields)."""
    from biasgan_tpu.config import parse_config
    from biasgan_tpu.models import create_model

    cfg = parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "synthetic",
            "--netG", "unet_d4", "--crop_size", "32", "--input_nc", "1",
            "--output_nc", "1", "--ngf", "8", "--ndf", "8",
            "--phase", "train",
            "--checkpoints_dir", str(tmp_path), "--name", "pt",
        ],
        train=False,
    )
    model = create_model(cfg)  # would raise AttributeError(beta1) before
    assert not model.is_train
    assert not hasattr(model, "_train_step")


def test_abstract_like_pins_local_sharding():
    """Restore skeletons carry a concrete local-device sharding so a
    checkpoint saved on one backend (TPU) restores on another (CPU host)."""
    import jax
    import jax.numpy as jnp

    from biasgan_tpu.utils.checkpoint import abstract_like

    sk = abstract_like({"w": jnp.zeros((2, 2)), "n": 3})
    assert isinstance(sk["w"], jax.ShapeDtypeStruct)
    assert isinstance(sk["w"].sharding, jax.sharding.SingleDeviceSharding)
    assert sk["n"] == 3
