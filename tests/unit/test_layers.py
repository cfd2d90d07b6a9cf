"""Unit tests: conv/conv-transpose output sizing vs. the torch formulas,
padding modes, norm semantics (SURVEY.md section 4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from biasgan_tpu.nn.layers import (
    conv2d,
    conv_transpose2d,
    instance_norm,
    pad_hw,
)


def _rand(key, shape):
    return jax.random.normal(jax.random.PRNGKey(key), shape, jnp.float32)


@pytest.mark.parametrize("w_in,k,s,p", [(64, 4, 2, 1), (64, 3, 1, 1), (65, 7, 1, 3), (32, 4, 1, 1)])
def test_conv2d_output_size(w_in, k, s, p):
    x = _rand(0, (2, w_in, w_in, 3))
    kern = _rand(1, (k, k, 3, 5))
    y = conv2d(x, kern, None, (s, s), (p, p))
    expect = (w_in + 2 * p - k) // s + 1  # torch Conv2d formula
    assert y.shape == (2, expect, expect, 5)


@pytest.mark.parametrize(
    "w_in,k,s,p,op", [(16, 4, 2, 1, 0), (16, 3, 2, 1, 1), (7, 4, 2, 1, 0)]
)
def test_conv_transpose2d_output_size(w_in, k, s, p, op):
    x = _rand(0, (2, w_in, w_in, 3))
    kern = _rand(1, (k, k, 3, 5))
    y = conv_transpose2d(x, kern, None, (s, s), (p, p), (op, op))
    expect = (w_in - 1) * s - 2 * p + k + op  # torch ConvTranspose2d formula
    assert y.shape == (2, expect, expect, 5)


def test_pad_modes():
    x = jnp.arange(4.0).reshape(1, 1, 4, 1)
    zero = pad_hw(x, (0, 0), (1, 1), w_mode="zero")
    assert zero[0, 0, 0, 0] == 0 and zero[0, 0, -1, 0] == 0
    wrap = pad_hw(x, (0, 0), (1, 1), w_mode="wrap")
    assert wrap[0, 0, 0, 0] == 3 and wrap[0, 0, -1, 0] == 0
    refl = pad_hw(x, (0, 0), (1, 1), w_mode="reflect")
    assert refl[0, 0, 0, 0] == 1 and refl[0, 0, -1, 0] == 2


def test_instance_norm_stats():
    x = _rand(0, (2, 8, 8, 3)) * 5 + 2
    y = instance_norm(x)
    mean = jnp.mean(y, axis=(1, 2))
    var = jnp.var(y, axis=(1, 2))
    np.testing.assert_allclose(np.asarray(mean), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var), 1.0, atol=1e-3)


def test_conv_transpose_matches_manual_dilation():
    """convT(k4,s2,p1) == correlate(dilate(x), flip(kernel)) padded by 2."""
    x = _rand(0, (1, 6, 6, 2))
    kern = _rand(1, (4, 4, 2, 3))
    y = conv_transpose2d(x, kern, None, (2, 2), (1, 1))
    # manual: dilate then correlate with flipped kernel
    xd = jnp.zeros((1, 11, 11, 2)).at[:, ::2, ::2, :].set(x)
    xd = jnp.pad(xd, ((0, 0), (2, 2), (2, 2), (0, 0)))
    ref = jax.lax.conv_general_dilated(
        xd, kern[::-1, ::-1], (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# MXU-friendly restructurings of tiny-channel convs must be exact transforms
# (space-to-depth forward path + custom-VJP input/weight grads)
# ---------------------------------------------------------------------------


@pytest.fixture(autouse=True)
def _force_restructured_convs(monkeypatch):
    """The M >= 64k gate routes small test shapes to the plain path; force
    it open here so the s2d / tiny-cin exactness tests keep exercising the
    restructured kernels (the gates are read live at trace time)."""
    monkeypatch.setenv("BIASGAN_S2D_MIN_M", "1")


def _plain_conv(x, kern, stride, pad):
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    return jax.lax.conv_general_dilated(
        xp, kern, stride, "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize(
    "cin,cout,k,s,p,hw",
    [
        (64, 3, 7, 1, 3, 32),   # resnet head (s2d forward path)
        (3, 64, 7, 1, 3, 32),   # resnet stem (tiny-cin custom VJP)
        (3, 64, 4, 2, 1, 32),   # unet/patchgan first conv, strided
        (6, 64, 4, 2, 1, 32),   # conditional D first conv
        (64, 1, 3, 1, 1, 30),   # patchgan verdict head (30 % 4 != 0 -> f=2)
        (64, 3, 3, 1, 1, 9),    # odd size: no factor divides -> plain path
        (8, 16, 3, 2, 1, 32),   # resnet downconv: inexact tiling (34-3)%2=1
        (3, 64, 3, 2, 1, 32),   # tiny-cin strided, inexact tiling
        (3, 48, 5, 3, 2, 32),   # stride 3, deficit 2
    ],
)
def test_tiny_channel_conv_value_and_grads_match_plain(cin, cout, k, s, p, hw):
    x = _rand(0, (2, hw, hw, cin))
    kern = 0.1 * _rand(1, (k, k, cin, cout))

    def ours(x, kern):
        return conv2d(x, kern, None, (s, s), (p, p))

    def plain(x, kern):
        return _plain_conv(x, kern, (s, s), p)

    np.testing.assert_allclose(
        np.asarray(ours(x, kern)), np.asarray(plain(x, kern)), rtol=1e-5, atol=1e-5
    )

    def loss_ours(x, kern):
        return jnp.sum(jnp.sin(ours(x, kern)))

    def loss_plain(x, kern):
        return jnp.sum(jnp.sin(plain(x, kern)))

    gx, gk = jax.grad(loss_ours, argnums=(0, 1))(x, kern)
    px, pk = jax.grad(loss_plain, argnums=(0, 1))(x, kern)
    # weight grads sum O(B*H*W) f32 terms in a different association order
    np.testing.assert_allclose(np.asarray(gx), np.asarray(px), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(gk), np.asarray(pk), rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize(
    "cin,cout,k,s,p,op,hw",
    [
        (16, 8, 4, 2, 1, 0, 16),   # unet up conv
        (16, 12, 3, 2, 1, 1, 16),  # resnet up conv (output_padding 1)
        (8, 16, 4, 2, 1, 0, 15),   # odd input size
        (8, 8, 5, 3, 2, 0, 12),    # stride 3
        (8, 8, 2, 2, 0, 0, 16),    # k == s (pure depth-to-space)
    ],
)
def test_convt_d2s_matches_dilated_form(cin, cout, k, s, p, op, hw, monkeypatch):
    """The phase-decomposed transposed conv (depth-to-space restructuring,
    BIASGAN_CONVT_D2S=1) must equal the lhs_dilation form exactly, values
    and grads. The d2s path is asserted to actually engage (it is opt-in and
    would otherwise silently compare the plain path against itself)."""
    from biasgan_tpu.nn import layers
    from biasgan_tpu.nn.layers import conv_transpose2d

    x = _rand(0, (2, hw, hw, cin))
    kern = 0.1 * _rand(1, (k, k, cin, cout))

    def run(x, kern):
        return conv_transpose2d(x, kern, None, (s, s), (p, p), (op, op))

    # the tiny-cout s2d branch would otherwise shadow d2s for cout <= 8
    monkeypatch.setenv("BIASGAN_S2D_MAX_COUT", "0")
    monkeypatch.setenv("BIASGAN_CONVT_D2S", "0")
    ref = run(x, kern)
    gr = jax.grad(lambda a, b: jnp.sum(jnp.sin(run(a, b))), (0, 1))(x, kern)

    calls = []
    orig = layers._convt_d2s
    monkeypatch.setattr(
        layers, "_convt_d2s", lambda *a, **kw: calls.append(1) or orig(*a, **kw)
    )
    monkeypatch.setenv("BIASGAN_CONVT_D2S", "1")
    got = run(x, kern)
    gg = jax.grad(lambda a, b: jnp.sum(jnp.sin(run(a, b))), (0, 1))(x, kern)
    assert calls, "d2s path did not engage; the comparison would be vacuous"
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)
    for a, b in zip(gg, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)


def test_tiny_channel_conv_under_vmap_and_bf16():
    """The custom-VJP path must compose with vmap (scan device loop) and
    bfloat16 compute."""
    x = _rand(0, (2, 2, 16, 16, 3)).astype(jnp.bfloat16)
    kern = (0.1 * _rand(1, (4, 4, 3, 8))).astype(jnp.bfloat16)

    def f(x, kern):
        return jnp.sum(conv2d(x, kern, None, (2, 2), (1, 1)).astype(jnp.float32))

    vg = jax.vmap(jax.grad(f, argnums=1), in_axes=(0, None))(x, kern)
    assert vg.shape == (2, 4, 4, 3, 8)
    assert bool(jnp.all(jnp.isfinite(vg.astype(jnp.float32))))


# ---------------------------------------------------------------------------
# r5 globe pre/post levers (VERDICT r4 item 2): exactness of the candidate
# reformulations against the plain lax forms
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "k,f,h,w,cin,cout",
    [(7, 4, 20, 28, 3, 5), (3, 4, 16, 24, 4, 3), (7, 2, 12, 16, 3, 8),
     (5, 4, 24, 16, 2, 4)],
)
def test_conv_s2d_full_exact(k, f, h, w, cin, cout):
    """conv_s2d_full (input+output space-to-depth conv — the globe stem/head
    reformulation) equals the raw VALID conv on the padded input."""
    from biasgan_tpu.nn.layers import conv_s2d_full, pad_hw

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, cin, cout)).astype(np.float32))
    p = k // 2
    xp = pad_hw(x, (p, p), (p, p), "reflect", "wrap")
    ref = jax.lax.conv_general_dilated(
        xp, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    y = conv_s2d_full(xp, kern, f)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0)])
def test_convt_onebuf_exact(k, s, p, op):
    """--convt_onebuf (dilation + circular pad in ONE scatter buffer) is
    bit-identical to the dilate-then-pad periodic conv-transpose."""
    from biasgan_tpu import perf_gates
    from biasgan_tpu.nn.layers import conv_transpose2d

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 9, 12, 4)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, 4, 6)).astype(np.float32))
    ref = conv_transpose2d(x, kern, None, (s, s), (p, p), (op, op), w_mode="wrap")
    with perf_gates.overrides(convt_onebuf=True):
        y = conv_transpose2d(x, kern, None, (s, s), (p, p), (op, op), w_mode="wrap")
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_cin_pad_exact():
    """--cin_pad (zero-pad tiny input channels for the emitter) is exact:
    fwd equal to the unpadded conv, grads equal through the pad transpose."""
    from biasgan_tpu import perf_gates

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 16, 20, 3)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(7, 7, 3, 6)).astype(np.float32))

    def f(x, k, gate):
        with perf_gates.overrides(cin_pad=gate, s2d_min_m=1, s2d_max_cout=0):
            return conv2d(x, k, None, (1, 1), (3, 3), "reflect", "wrap")

    ref = f(x, kern, 0)
    y = f(x, kern, 8)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)

    def loss(x, k, gate):
        return jnp.sum(jnp.tanh(f(x, k, gate)))

    gx0, gk0 = jax.grad(loss, argnums=(0, 1))(x, kern, 0)
    gx1, gk1 = jax.grad(loss, argnums=(0, 1))(x, kern, 8)
    np.testing.assert_allclose(np.asarray(gx1), np.asarray(gx0), rtol=2e-5, atol=2e-5)
    # the weight-grad contraction reassociates with the extra channels:
    # math-exact, not bit-exact (measured ~3e-5 abs on O(10) values)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk0), rtol=1e-4, atol=1e-4)
    assert gx1.shape == x.shape and gk1.shape == kern.shape


@pytest.mark.parametrize("k,s,p,op", [(3, 2, 1, 1), (4, 2, 1, 0)])
def test_convt_d2s_wrap_exact(k, s, p, op):
    """Periodic (wrap) phase-decomposed conv-transpose equals the manual
    W-dilation path: the phases read x at original-space offsets, so a
    circular pad of x IS the periodic dilated signal."""
    from biasgan_tpu import perf_gates
    from biasgan_tpu.nn.layers import conv_transpose2d

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(2, 9, 12, 4)).astype(np.float32))
    kern = jnp.asarray(rng.normal(size=(k, k, 4, 6)).astype(np.float32))
    ref = conv_transpose2d(x, kern, None, (s, s), (p, p), (op, op), w_mode="wrap")
    with perf_gates.overrides(convt_d2s=True, s2d_min_m=1, s2d_max_cout=0):
        y = conv_transpose2d(x, kern, None, (s, s), (p, p), (op, op), w_mode="wrap")
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=2e-5, atol=2e-5)
