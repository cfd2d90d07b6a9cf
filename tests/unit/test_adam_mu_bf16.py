"""--adam_mu_dtype bfloat16: the bf16 first-moment optimizer tracks the
f32-moment trajectory closely (bf16 has f32's exponent range; only mantissa
rounding differs) while halving that state's footprint/traffic."""

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu.config import parse_config
from biasgan_tpu.models.pix2pix import create_state, make_train_step


def _run(mu_dtype, steps=5):
    cfg = parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "synthetic",
            "--netG", "unet_d4", "--crop_size", "32", "--input_nc", "1",
            "--output_nc", "1", "--batch_size", "2", "--ngf", "8",
            "--ndf", "8", "--norm", "instance", "--no_dropout",
            "--adam_mu_dtype", mu_dtype,
            "--checkpoints_dir", "/tmp/bgt_mu", "--name", "mu",
        ],
        train=True,
    )
    cfg.steps_per_epoch = 4
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    batch = {"A": a, "B": jnp.tanh(a)}
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))
    rng = jax.random.PRNGKey(2)
    for i in range(steps):
        state, losses, _ = step(state, batch, jax.random.fold_in(rng, i))
    return state, losses


def test_bf16_mu_tracks_f32_trajectory():
    s32, l32 = _run("float32")
    s16, l16 = _run("bfloat16")
    # the mu leaves really are bf16
    mus = jax.tree_util.tree_leaves(s16.opts["G"])
    assert any(x.dtype == jnp.bfloat16 for x in mus if hasattr(x, "dtype"))
    # loss trajectory within bf16 rounding accumulation
    for k in l32:
        np.testing.assert_allclose(
            float(l16[k]), float(l32[k]), rtol=2e-2, atol=2e-2, err_msg=k
        )
    # parameters stay close after 5 updates. Adam moves ~+-lr per step
    # regardless of grad magnitude (g/sqrt(g^2)), so a near-zero grad whose
    # bf16-rounded mu flips sign moves a param by up to 2*lr per step —
    # the bound is scale-aware (5 steps x 2 x 2e-4 = 2e-3), not a float
    # tolerance. Structural bugs (wrong dtype math) would be >>1e-2.
    for a, b in zip(
        jax.tree_util.tree_leaves(s32.nets), jax.tree_util.tree_leaves(s16.nets)
    ):
        np.testing.assert_allclose(
            np.asarray(b, np.float32), np.asarray(a, np.float32),
            rtol=0, atol=2e-3,
        )
