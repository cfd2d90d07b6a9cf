"""Differentiable fused resnet-block conv (ops/pallas_conv.conv3x3_fused_t)
— the --fused_blocks TRAINING path (VERDICT r3 item 2). The forward is the
same Pallas kernel as inference; the custom VJP must equal JAX autodiff of
the XLA composition (pad_hw + VALID conv + bias + moments) for every pad
mode, with and without the instance-norm prologue, through the garbage-tail
h_run protocol, and end-to-end through a ResNetGenerator under jax.grad."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.ops.pallas_conv import (
    conv3x3_fused_t,
    embed_halo_w,
    fused_block_plan,
)

_PAD = {"zero": "constant", "reflect": "reflect", "wrap": "wrap"}


def _ref(x_l, k, bias, a, b, h_mode, w_mode):
    """XLA reference of the fused call on the LOGICAL rows: optional
    prologue affine+ReLU, SAME conv, bias, f32 moments."""
    if a is not None:
        pre = x_l * a[:, None, None, :] + b[:, None, None, :]
        u = jnp.maximum(pre, 0.0)
    else:
        u = x_l
    if w_mode == "halo":
        wlog = x_l.shape[2] - 16
        u = jax.lax.slice_in_dim(u, 7, 9 + wlog, axis=2)
        yp = jnp.pad(u, ((0, 0), (1, 1), (0, 0), (0, 0)), mode=_PAD[h_mode])
    else:
        yp = jnp.pad(u, ((0, 0), (1, 1), (0, 0), (0, 0)), mode=_PAD[h_mode])
        yp = jnp.pad(yp, ((0, 0), (0, 0), (1, 1), (0, 0)), mode=_PAD[w_mode])
    y = jax.lax.conv_general_dilated(
        yp, k, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias
    return y, jnp.sum(y, axis=(1, 2)), jnp.sum(y * y, axis=(1, 2))


@pytest.mark.parametrize(
    "h_mode,w_mode,lh,prologue",
    [
        ("reflect", "wrap", 13, True),     # the resnet-block composition
        ("reflect", "reflect", 10, True),  # reference ReflectionPad default
        ("wrap", "zero", 12, False),       # no-prologue conv0 shape
        ("zero", "wrap", 11, True),
        ("reflect", "halo", 10, True),     # spatial-sharding layout
    ],
)
def test_fused_t_grads_match_autodiff(h_mode, w_mode, lh, prologue):
    n, w, c, co = 2, 16, 8, 8
    rng = np.random.RandomState(lh)
    plan = fused_block_plan(lh, w, c, co, jnp.float32, interpret=True)
    hr = plan.h_run
    x_l = jnp.asarray(rng.randn(n, lh, w, c), jnp.float32)
    if w_mode == "halo":
        xp = jnp.concatenate([x_l[:, :, -1:], x_l, x_l[:, :, :1]], axis=2)
        x_l = embed_halo_w(xp)
    x = jnp.pad(x_l, ((0, 0), (0, hr - lh), (0, 0), (0, 0)))
    k = jnp.asarray(rng.randn(3, 3, c, co) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(co) * 0.1, jnp.float32)
    a = jnp.asarray(1 + 0.1 * rng.randn(n, c), jnp.float32) if prologue else None
    b = jnp.asarray(0.1 * rng.randn(n, c), jnp.float32) if prologue else None
    # cotangent weights for output AND both moments (exercises ds/dq)
    gy = jnp.asarray(rng.randn(n, hr, w if w_mode != "halo" else w, co),
                     jnp.float32)
    gs = jnp.asarray(rng.randn(n, co), jnp.float32)
    gq = jnp.asarray(0.1 * rng.randn(n, co), jnp.float32)

    def loss_fused(x, k, bias, a, b):
        y, (s, q) = conv3x3_fused_t(
            x, k, bias, prologue=None if a is None else (a, b),
            plan=plan, h_mode=h_mode, w_mode=w_mode,
        )
        return (jnp.sum(y[:, :lh] * gy[:, :lh]) + jnp.sum(s * gs)
                + jnp.sum(q * gq))

    def loss_ref(x, k, bias, a, b):
        y, s, q = _ref(x[:, :lh], k, bias, a, b, h_mode, w_mode)
        return (jnp.sum(y * gy[:, :lh]) + jnp.sum(s * gs)
                + jnp.sum(q * gq))

    argnums = (0, 1, 2) + ((3, 4) if prologue else ())
    args = (x, k, bias, a, b)
    vf, gf = jax.jit(jax.value_and_grad(loss_fused, argnums=argnums))(*args)
    vr, gr = jax.jit(jax.value_and_grad(loss_ref, argnums=argnums))(*args)
    np.testing.assert_allclose(vf, vr, rtol=2e-5, atol=1e-4)
    for name, gfi, gri in zip(("dx", "dk", "dbias", "da", "db"), gf, gr):
        np.testing.assert_allclose(
            np.asarray(gfi), np.asarray(gri), rtol=2e-5, atol=2e-4,
            err_msg=f"{h_mode}/{w_mode} prologue={prologue}: {name}",
        )


def test_fused_t_grads_bf16_compute():
    """bf16 compute dtype through the custom VJP: the linearized pullback
    must keep cotangent/operand dtypes consistent (jax's conv transpose rule
    rejects a f32 cotangent against bf16 operands — the r4 TPU A/B failed at
    trace time on exactly this; f32-only tests cannot catch it). Grads must
    trace AND stay within bf16 tolerance of the f32 reference."""
    n, lh, w, c = 2, 8, 16, 8
    rng = np.random.RandomState(7)
    plan = fused_block_plan(lh, w, c, c, jnp.bfloat16, interpret=True)
    x32 = jnp.asarray(rng.randn(n, plan.h_run, w, c), jnp.float32)
    k32 = jnp.asarray(rng.randn(3, 3, c, c) * 0.1, jnp.float32)
    bias = jnp.asarray(rng.randn(c) * 0.1, jnp.float32)
    a = jnp.asarray(1 + 0.1 * rng.randn(n, c), jnp.float32)
    b = jnp.asarray(0.1 * rng.randn(n, c), jnp.float32)
    gy = jnp.asarray(rng.randn(n, plan.h_run, w, c), jnp.float32)

    def loss(x, k, bias, a, b, plan):
        y, (s, q) = conv3x3_fused_t(
            x, k, bias, prologue=(a, b), plan=plan,
            h_mode="reflect", w_mode="wrap",
        )
        return (jnp.sum(y[:, :lh].astype(jnp.float32) * gy[:, :lh])
                + jnp.sum(s) + 0.1 * jnp.sum(q))

    gb = jax.grad(lambda x, k, bi, a, b: loss(
        x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), bi, a, b, plan),
        argnums=(0, 1, 2, 3, 4))(x32, k32, bias, a, b)
    plan32 = fused_block_plan(lh, w, c, c, jnp.float32, interpret=True)
    gf = jax.grad(lambda x, k, bi, a, b: loss(x, k, bi, a, b, plan32),
                  argnums=(0, 1, 2, 3, 4))(x32, k32, bias, a, b)
    for name, bv, fv in zip(("dx", "dk", "dbias", "da", "db"), gb, gf):
        fv = np.asarray(fv)
        np.testing.assert_allclose(
            np.asarray(bv, np.float32), fv,
            atol=0.05 * max(1.0, np.abs(fv).max()), rtol=0.1,
            err_msg=name,
        )


def test_fused_t_garbage_tail_gets_zero_cotangent():
    """Rows >= logical_h of the h_run input are never read by the kernel, so
    their gradient must be exactly zero (the next chain link upstream relies
    on it)."""
    lh, w, c = 5, 8, 8
    plan = fused_block_plan(lh, w, c, c, jnp.float32, interpret=True)
    assert plan.h_run > lh
    x = jnp.ones((1, plan.h_run, w, c))
    k = jnp.ones((3, 3, c, c)) * 0.01
    bias = jnp.zeros((c,))

    def loss(x):
        y, (s, q) = conv3x3_fused_t(x, k, bias, plan=plan,
                                    h_mode="reflect", w_mode="wrap")
        return jnp.sum(y[:, :lh]) + jnp.sum(s) + jnp.sum(q)

    dx = jax.grad(loss)(x)
    assert np.all(np.asarray(dx[:, lh:]) == 0.0)
    assert np.any(np.asarray(dx[:, :lh]) != 0.0)


def _gen(w_mode="wrap"):
    from biasgan_tpu.nn.generators import ResNetGenerator

    return ResNetGenerator(
        output_nc=3, ngf=8, n_blocks=2, norm_type="instance",
        use_dropout=False, w_mode=w_mode,
    )


def test_resnet_generator_fused_train_grads_match(monkeypatch):
    """End-to-end: params- and input-grads of the generator under the fused
    TRAIN path (BIASGAN_FUSED_TRAIN=1) equal the default XLA path — the
    moments->affine->prologue chain pulls back correctly through the whole
    block chain, residual adds, and the h_run padding."""
    g = _gen()
    # H=20: blocks run at H=5 (prime), so TH=2 forces the h_run ceil-pad +
    # garbage-tail protocol through the chain under jax.grad
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 20, 32, 3))
    gy = jax.random.normal(jax.random.PRNGKey(1), x.shape[:3] + (3,))
    params = g.init(jax.random.PRNGKey(2), x)

    def loss(p, x):
        return jnp.sum(g.apply(p, x, train=True) * gy)

    want_v, want_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_TRAIN", "1")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")
    monkeypatch.setenv("BIASGAN_FUSED_TH", "2")  # multi-tile + partial tail
    got_v, got_g = jax.value_and_grad(loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(got_v, want_v, rtol=1e-4, atol=1e-4)
    flat_w, _ = jax.tree_util.tree_flatten_with_path(want_g)
    flat_g = jax.tree_util.tree_leaves(got_g)
    assert len(flat_w) == len(flat_g)
    for (path, wv), gv in zip(flat_w, flat_g):
        np.testing.assert_allclose(
            np.asarray(gv), np.asarray(wv), rtol=2e-4, atol=5e-4,
            err_msg=jax.tree_util.keystr(path),
        )


def test_cyclegan_full_step_fused_train_matches(tmp_path, monkeypatch):
    """The whole jitted CycleGAN train step — both Gs fused-trained, both
    Ds, pools, both Adams — must produce the same losses and updated
    parameters as the default XLA path (the judged line-9 composition this
    path exists to speed up)."""
    from biasgan_tpu.config import parse_config
    from biasgan_tpu.models.cyclegan import create_state, make_train_step

    cfg = parse_config(
        [
            "--model", "cycle_gan", "--dataset_mode", "synthetic",
            "--netG", "resnet_3blocks", "--crop_size", "32",
            "--input_nc", "1", "--output_nc", "1", "--batch_size", "2",
            "--ngf", "8", "--ndf", "8", "--synthetic_samples", "4",
            "--norm", "instance", "--pool_size", "4",
            "--checkpoints_dir", str(tmp_path), "--name", "fused_step",
        ],
        train=True,
    )
    cfg.steps_per_epoch = 4
    a = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 1))
    batch = {"A": a, "B": jnp.tanh(a)}
    rng = jax.random.PRNGKey(2)
    state0 = create_state(cfg, jax.random.PRNGKey(0))

    s_ref, l_ref, _ = jax.jit(make_train_step(cfg))(state0, batch, rng)

    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_TRAIN", "1")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")
    monkeypatch.setenv("BIASGAN_FUSED_TH", "2")
    s_fused, l_fused, _ = jax.jit(make_train_step(cfg))(state0, batch, rng)

    for k in l_ref:
        np.testing.assert_allclose(
            float(l_fused[k]), float(l_ref[k]), rtol=2e-4, atol=2e-4,
            err_msg=k,
        )
    for x, y in zip(
        jax.tree_util.tree_leaves(s_ref.nets),
        jax.tree_util.tree_leaves(s_fused.nets),
    ):
        np.testing.assert_allclose(
            np.asarray(y), np.asarray(x), rtol=0, atol=1.5e-3
        )


def test_fused_train_gate_requires_optin(monkeypatch):
    """BIASGAN_FUSED_BLOCK alone must keep training on the XLA path (the
    r3 inference contract); only the explicit BIASGAN_FUSED_TRAIN=1 opt-in
    (train.py --fused_blocks) engages the differentiable kernels."""
    g = _gen()
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16, 3))
    params = g.init(jax.random.PRNGKey(1), x)
    plan = g._fused_block_plan(
        jnp.zeros((1, 8, 16, 128)), True, None
    )
    assert plan is None  # no env at all
    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")
    assert g._fused_block_plan(jnp.zeros((1, 8, 16, 128)), True, None) is None
    monkeypatch.setenv("BIASGAN_FUSED_TRAIN", "1")
    assert g._fused_block_plan(
        jnp.zeros((1, 8, 16, 128)), True, None
    ) is not None
    # eval plans are unaffected by the train opt-in
    assert g._fused_block_plan(
        jnp.zeros((1, 8, 16, 128)), False, None
    ) is not None
