"""PyTorch-CPU parity oracle (SURVEY.md section 4 item 1).

The reference is a torch framework; its mount was empty, so reference
semantics are operationalized here: torch twins of every building block and
network (written to the canonical family semantics) get OUR weights copied
in, and forward outputs must agree to float tolerance. This is what makes
"matching ... corrected-field statistics within float tolerance"
(BASELINE.json line 5) testable without the reference source.

torch is the ORACLE ONLY — no torch in the product (SURVEY.md section 7 [E]).

Weight layout mapping:
  conv     : flax HWIO  kernel[kh,kw,ic,oc] == torch OIHW w[oc,ic,kh,kw]
  convT    : flax HWIO  kernel[kh,kw,ic,oc] == torch IOHW w[ic,oc,kh,kw]
  batchnorm: scale==weight, bias==bias, mean==running_mean, var==running_var
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from biasgan_tpu.nn import define_D, define_G, init_params
from biasgan_tpu.nn.layers import conv2d, conv_transpose2d, instance_norm

RTOL, ATOL = 2e-4, 2e-4


def _np(x):
    return np.asarray(x)


def _nhwc(t):  # torch NCHW tensor -> numpy NHWC
    return t.detach().numpy().transpose(0, 2, 3, 1)


def _nchw(a):  # numpy NHWC -> torch NCHW
    return torch.from_numpy(np.asarray(a).transpose(0, 3, 1, 2).copy())


# ---------------------------------------------------------------------------
# block-level parity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("k,s,p", [(4, 2, 1), (3, 1, 1), (7, 1, 3), (1, 1, 0)])
def test_conv2d_parity(k, s, p):
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    w = rng.normal(size=(k, k, 3, 5)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)
    ours = conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), (s, s), (p, p))
    ref = F.conv2d(
        _nchw(x), torch.from_numpy(w.transpose(3, 2, 0, 1).copy()),
        torch.from_numpy(b), stride=s, padding=p,
    )
    np.testing.assert_allclose(_np(ours), _nhwc(ref), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("k,s,p,op", [(4, 2, 1, 0), (3, 2, 1, 1)])
def test_conv_transpose2d_parity(k, s, p, op):
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 9, 9, 3)).astype(np.float32)
    w = rng.normal(size=(k, k, 3, 5)).astype(np.float32)
    b = rng.normal(size=(5,)).astype(np.float32)
    ours = conv_transpose2d(
        jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), (s, s), (p, p), (op, op)
    )
    ref = F.conv_transpose2d(
        _nchw(x), torch.from_numpy(w.transpose(2, 3, 0, 1).copy()),
        torch.from_numpy(b), stride=s, padding=p, output_padding=op,
    )
    np.testing.assert_allclose(_np(ours), _nhwc(ref), rtol=RTOL, atol=ATOL)


def test_instance_norm_parity():
    rng = np.random.default_rng(2)
    x = (rng.normal(size=(2, 8, 8, 3)) * 3 + 1).astype(np.float32)
    ours = instance_norm(jnp.asarray(x))
    ref = F.instance_norm(_nchw(x), eps=1e-5)
    np.testing.assert_allclose(_np(ours), _nhwc(ref), rtol=RTOL, atol=ATOL)


def test_batchnorm_train_parity():
    """flax BatchNorm(momentum=0.9) == torch BatchNorm2d(momentum=0.1):
    normalized output AND updated running stats."""
    from flax import linen as nn

    rng = np.random.default_rng(3)
    x = (rng.normal(size=(4, 8, 8, 3)) * 2 + 0.5).astype(np.float32)
    bn = nn.BatchNorm(use_running_average=False, momentum=0.9, epsilon=1e-5)
    v = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours, mut = bn.apply(v, jnp.asarray(x), mutable=["batch_stats"])

    tbn = tnn.BatchNorm2d(3, eps=1e-5, momentum=0.1)
    tbn.train()
    with torch.no_grad():
        ref = tbn(_nchw(x))
    np.testing.assert_allclose(_np(ours), _nhwc(ref), rtol=RTOL, atol=ATOL)
    np.testing.assert_allclose(
        _np(mut["batch_stats"]["mean"]), tbn.running_mean.numpy(), rtol=1e-3, atol=1e-4
    )
    # torch running_var uses the UNBIASED batch variance; flax uses biased.
    n = 4 * 8 * 8
    np.testing.assert_allclose(
        _np(mut["batch_stats"]["var"]),
        (tbn.running_var.numpy() - 0.9) / (n / (n - 1)) + 0.9,
        rtol=5e-3, atol=1e-4,
    )


# ---------------------------------------------------------------------------
# torch twins of the networks (canonical family semantics)
# ---------------------------------------------------------------------------


def _norm2d(norm, ch):
    if norm == "batch":
        return tnn.BatchNorm2d(ch)
    if norm == "instance":
        return tnn.InstanceNorm2d(ch, affine=False, track_running_stats=False)
    return tnn.Identity()


class TorchUNet(tnn.Module):
    """Canonical UnetGenerator semantics, iterative form (same math as the
    recursive reference blocks; see biasgan_tpu/nn/generators.py)."""

    def __init__(self, in_nc, out_nc, ngf, num_downs, norm):
        super().__init__()
        use_bias = norm != "batch"
        D = num_downs
        dc = [min(2**i, 8) * ngf for i in range(D)]
        self.downs = tnn.ModuleList()
        self.down_norms = tnn.ModuleDict()
        prev = in_nc
        for i in range(D):
            self.downs.append(tnn.Conv2d(prev, dc[i], 4, 2, 1, bias=use_bias))
            if 0 < i < D - 1:
                self.down_norms[str(i)] = _norm2d(norm, dc[i])
            prev = dc[i]
        self.ups = tnn.ModuleDict()
        self.up_norms = tnn.ModuleDict()
        self.ups[str(D - 1)] = tnn.ConvTranspose2d(dc[D - 1], dc[D - 2], 4, 2, 1, bias=use_bias)
        self.up_norms[str(D - 1)] = _norm2d(norm, dc[D - 2])
        for i in range(D - 2, 0, -1):
            self.ups[str(i)] = tnn.ConvTranspose2d(2 * dc[i], dc[i - 1], 4, 2, 1, bias=use_bias)
            self.up_norms[str(i)] = _norm2d(norm, dc[i - 1])
        self.ups["0"] = tnn.ConvTranspose2d(2 * dc[0], out_nc, 4, 2, 1, bias=True)
        self.D = D

    def forward(self, x):
        D = self.D
        d = [self.downs[0](x)]
        for i in range(1, D):
            h = self.downs[i](F.leaky_relu(d[-1], 0.2))
            if i < D - 1:
                h = self.down_norms[str(i)](h)
            d.append(h)
        u = self.up_norms[str(D - 1)](self.ups[str(D - 1)](F.relu(d[D - 1])))
        for i in range(D - 2, 0, -1):
            u = torch.cat([d[i], u], dim=1)
            u = self.up_norms[str(i)](self.ups[str(i)](F.relu(u)))
        u = torch.cat([d[0], u], dim=1)
        return torch.tanh(self.ups["0"](F.relu(u)))


class TorchResnetBlock(tnn.Module):
    def __init__(self, dim, norm, use_bias):
        super().__init__()
        self.conv0 = tnn.Conv2d(dim, dim, 3, 1, 0, bias=use_bias)
        self.norm0 = _norm2d(norm, dim)
        self.conv1 = tnn.Conv2d(dim, dim, 3, 1, 0, bias=use_bias)
        self.norm1 = _norm2d(norm, dim)

    def forward(self, x):
        h = F.pad(x, (1, 1, 1, 1), mode="reflect")
        h = F.relu(self.norm0(self.conv0(h)))
        h = F.pad(h, (1, 1, 1, 1), mode="reflect")
        h = self.norm1(self.conv1(h))
        return x + h


class TorchResnetG(tnn.Module):
    def __init__(self, in_nc, out_nc, ngf, n_blocks, norm):
        super().__init__()
        use_bias = norm != "batch"
        self.stem = tnn.Conv2d(in_nc, ngf, 7, 1, 0, bias=use_bias)
        self.stem_norm = _norm2d(norm, ngf)
        self.down0 = tnn.Conv2d(ngf, ngf * 2, 3, 2, 1, bias=use_bias)
        self.down_norm0 = _norm2d(norm, ngf * 2)
        self.down1 = tnn.Conv2d(ngf * 2, ngf * 4, 3, 2, 1, bias=use_bias)
        self.down_norm1 = _norm2d(norm, ngf * 4)
        self.blocks = tnn.ModuleList(
            [TorchResnetBlock(ngf * 4, norm, use_bias) for _ in range(n_blocks)]
        )
        self.up0 = tnn.ConvTranspose2d(ngf * 4, ngf * 2, 3, 2, 1, output_padding=1, bias=use_bias)
        self.up_norm0 = _norm2d(norm, ngf * 2)
        self.up1 = tnn.ConvTranspose2d(ngf * 2, ngf, 3, 2, 1, output_padding=1, bias=use_bias)
        self.up_norm1 = _norm2d(norm, ngf)
        self.head = tnn.Conv2d(ngf, out_nc, 7, 1, 0, bias=True)

    def forward(self, x):
        h = F.pad(x, (3, 3, 3, 3), mode="reflect")
        h = F.relu(self.stem_norm(self.stem(h)))
        h = F.relu(self.down_norm0(self.down0(h)))
        h = F.relu(self.down_norm1(self.down1(h)))
        for b in self.blocks:
            h = b(h)
        h = F.relu(self.up_norm0(self.up0(h)))
        h = F.relu(self.up_norm1(self.up1(h)))
        h = F.pad(h, (3, 3, 3, 3), mode="reflect")
        return torch.tanh(self.head(h))


class TorchPatchGAN(tnn.Module):
    def __init__(self, in_nc, ndf, n_layers, norm):
        super().__init__()
        use_bias = norm != "batch"
        self.convs = tnn.ModuleList([tnn.Conv2d(in_nc, ndf, 4, 2, 1)])
        self.norms = tnn.ModuleDict()
        prev = ndf
        for n in range(1, n_layers):
            ch = ndf * min(2**n, 8)
            self.convs.append(tnn.Conv2d(prev, ch, 4, 2, 1, bias=use_bias))
            self.norms[str(n)] = _norm2d(norm, ch)
            prev = ch
        ch = ndf * min(2**n_layers, 8)
        self.convs.append(tnn.Conv2d(prev, ch, 4, 1, 1, bias=use_bias))
        self.norms[str(n_layers)] = _norm2d(norm, ch)
        self.out = tnn.Conv2d(ch, 1, 4, 1, 1)
        self.n_layers = n_layers

    def forward(self, x):
        h = F.leaky_relu(self.convs[0](x), 0.2)
        for n in range(1, self.n_layers + 1):
            h = F.leaky_relu(self.norms[str(n)](self.convs[n](h)), 0.2)
        return self.out(h)


# ---------------------------------------------------------------------------
# weight copying: flax params -> torch twin
# ---------------------------------------------------------------------------


def _copy_conv(tmod, p, transpose=False):
    k = np.asarray(p["kernel"])
    w = k.transpose(2, 3, 0, 1) if transpose else k.transpose(3, 2, 0, 1)
    tmod.weight.data = torch.from_numpy(w.copy())
    if "bias" in p:
        tmod.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())


def _copy_bn(tmod, p, stats):
    # The Norm wrapper nests flax's BatchNorm one level down.
    if "BatchNorm_0" in p:
        p = p["BatchNorm_0"]
    if "BatchNorm_0" in stats:
        stats = stats["BatchNorm_0"]
    tmod.weight.data = torch.from_numpy(np.asarray(p["scale"]).copy())
    tmod.bias.data = torch.from_numpy(np.asarray(p["bias"]).copy())
    tmod.running_mean.data = torch.from_numpy(np.asarray(stats["mean"]).copy())
    tmod.running_var.data = torch.from_numpy(np.asarray(stats["var"]).copy())


@pytest.mark.parametrize("norm", ["instance", "batch"])
def test_unet_forward_parity(norm):
    num_downs, ngf, in_nc, out_nc = 5, 8, 2, 3
    G = define_G(f"unet_d{num_downs}", output_nc=out_nc, ngf=ngf, norm=norm)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, in_nc)).astype(np.float32)
    v = init_params(G, jax.random.PRNGKey(0), jnp.asarray(x), train=False)
    ours = G.apply(v, jnp.asarray(x), False)

    tG = TorchUNet(in_nc, out_nc, ngf, num_downs, norm)
    p = v["params"]
    stats = v.get("batch_stats", {})
    for i in range(num_downs):
        _copy_conv(tG.downs[i], p[f"down{i}"])
        if norm == "batch" and 0 < i < num_downs - 1:
            _copy_bn(tG.down_norms[str(i)], p[f"down_norm{i}"], stats[f"down_norm{i}"])
        _copy_conv(tG.ups[str(i)], p[f"up{i}"], transpose=True)
        if norm == "batch" and i > 0:
            _copy_bn(tG.up_norms[str(i)], p[f"up_norm{i}"], stats[f"up_norm{i}"])
    tG.eval()  # running-stats BN == flax use_running_average
    with torch.no_grad():
        ref = tG(_nchw(x))
    np.testing.assert_allclose(_np(ours), _nhwc(ref), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("norm", ["instance", "batch"])
def test_resnet_forward_parity(norm):
    ngf, n_blocks, nc = 8, 3, 3
    G = define_G(f"resnet_{n_blocks}blocks", output_nc=nc, ngf=ngf, norm=norm)
    x = np.random.default_rng(1).normal(size=(1, 32, 32, nc)).astype(np.float32)
    v = init_params(G, jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    ours = G.apply(v, jnp.asarray(x), False)

    tG = TorchResnetG(nc, nc, ngf, n_blocks, norm)
    p = v["params"]
    stats = v.get("batch_stats", {})

    def bn(tmod, name):
        if norm == "batch":
            _copy_bn(tmod, p[name], stats[name])

    _copy_conv(tG.stem, p["stem"]); bn(tG.stem_norm, "stem_norm")
    _copy_conv(tG.down0, p["down0"]); bn(tG.down_norm0, "down_norm0")
    _copy_conv(tG.down1, p["down1"]); bn(tG.down_norm1, "down_norm1")
    for i in range(n_blocks):
        blk, pb = tG.blocks[i], p[f"block{i}"]
        _copy_conv(blk.conv0, pb["conv0"])
        _copy_conv(blk.conv1, pb["conv1"])
        if norm == "batch":
            sb = stats[f"block{i}"]
            _copy_bn(blk.norm0, pb["norm0"], sb["norm0"])
            _copy_bn(blk.norm1, pb["norm1"], sb["norm1"])
    _copy_conv(tG.up0, p["up0"], transpose=True); bn(tG.up_norm0, "up_norm0")
    _copy_conv(tG.up1, p["up1"], transpose=True); bn(tG.up_norm1, "up_norm1")
    _copy_conv(tG.head, p["head"])
    tG.eval()
    with torch.no_grad():
        ref = tG(_nchw(x))
    np.testing.assert_allclose(_np(ours), _nhwc(ref), rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("norm", ["instance", "batch"])
def test_patchgan_forward_parity(norm):
    ndf, n_layers, in_nc = 8, 3, 4
    D = define_D("n_layers", ndf=ndf, n_layers_D=n_layers, norm=norm)
    x = np.random.default_rng(2).normal(size=(2, 64, 64, in_nc)).astype(np.float32)
    v = init_params(D, jax.random.PRNGKey(2), jnp.asarray(x), train=False)
    ours = D.apply(v, jnp.asarray(x), False)

    tD = TorchPatchGAN(in_nc, ndf, n_layers, norm)
    p = v["params"]
    stats = v.get("batch_stats", {})
    for n in range(n_layers + 1):
        _copy_conv(tD.convs[n], p[f"conv{n}"])
        if norm == "batch" and n > 0:
            _copy_bn(tD.norms[str(n)], p[f"norm{n}"], stats[f"norm{n}"])
    _copy_conv(tD.out, p["conv_out"])
    tD.eval()
    with torch.no_grad():
        ref = tD(_nchw(x))
    np.testing.assert_allclose(_np(ours), _nhwc(ref), rtol=RTOL, atol=ATOL)


# ---------------------------------------------------------------------------
# K-step TRAINING-DYNAMICS parity (VERDICT r4 item 4)
# ---------------------------------------------------------------------------
# Forward parity above pins the nets; this pins the *optimization*: same
# init, same batches, K alternating D-then-G steps — torch Adam(beta1=0.5)
# + BCEWithLogits + L1 (the reference Pix2PixModel.optimize_parameters
# semantics) vs our ONE jitted train step. Per-step losses AND the evolved
# parameters must agree to f32 tolerance, which pins: Adam semantics
# (bias correction, eps placement), loss reductions, the D-first update
# order, and that G's update sees the FRESHLY UPDATED D. This is the
# trained-behavior half of the BASELINE.json line-5 float-tolerance
# contract that forward parity alone cannot test.


def _copy_unet_to_torch(tG, v, num_downs, norm):
    p = v["params"]
    stats = v.get("batch_stats", {})
    for i in range(num_downs):
        _copy_conv(tG.downs[i], p[f"down{i}"])
        if norm == "batch" and 0 < i < num_downs - 1:
            _copy_bn(tG.down_norms[str(i)], p[f"down_norm{i}"], stats[f"down_norm{i}"])
        _copy_conv(tG.ups[str(i)], p[f"up{i}"], transpose=True)
        if norm == "batch" and i > 0:
            _copy_bn(tG.up_norms[str(i)], p[f"up_norm{i}"], stats[f"up_norm{i}"])


def _copy_patchgan_to_torch(tD, v, n_layers, norm):
    p = v["params"]
    stats = v.get("batch_stats", {})
    for n in range(n_layers + 1):
        _copy_conv(tD.convs[n], p[f"conv{n}"])
        if norm == "batch" and n > 0:
            _copy_bn(tD.norms[str(n)], p[f"norm{n}"], stats[f"norm{n}"])
    _copy_conv(tD.out, p["conv_out"])


@pytest.mark.parametrize("gan_mode", ["vanilla", "lsgan"])
def test_pix2pix_kstep_training_parity(gan_mode):
    """K=4 alternating G/D optimization steps, torch oracle vs jitted step."""
    from biasgan_tpu.config import TrainConfig, merge_config_cls
    from biasgan_tpu.models.pix2pix import (
        Pix2PixConfig,
        create_state,
        make_train_step,
    )

    K = 4
    num_downs, ngf, ndf, n_layers, nc, crop = 4, 8, 8, 3, 1, 32
    cls = merge_config_cls(TrainConfig, Pix2PixConfig)
    cfg = cls(
        model="pix2pix", netG=f"unet_d{num_downs}", netD="basic",
        norm="instance", no_dropout=True, gan_mode=gan_mode, pool_size=0,
        crop_size=crop, input_nc=nc, output_nc=nc, batch_size=2,
        ngf=ngf, ndf=ndf, steps_per_epoch=100, n_epochs=100,
        lr=2e-4, beta1=0.5, lr_policy="linear",
        checkpoints_dir="/tmp/bgt_kstep", name="kstep",
    )
    state = create_state(cfg, jax.random.PRNGKey(0))
    step = jax.jit(make_train_step(cfg))

    # torch twins with OUR initial weights
    tG = TorchUNet(nc, nc, ngf, num_downs, "instance")
    tD = TorchPatchGAN(2 * nc, ndf, n_layers, "instance")
    _copy_unet_to_torch(tG, state.nets["G"], num_downs, "instance")
    _copy_patchgan_to_torch(tD, state.nets["D"], n_layers, "instance")
    tG.train(), tD.train()
    opt_G = torch.optim.Adam(tG.parameters(), lr=2e-4, betas=(0.5, 0.999))
    opt_D = torch.optim.Adam(tD.parameters(), lr=2e-4, betas=(0.5, 0.999))

    def gan(pred, real: bool):
        tgt = torch.ones_like(pred) if real else torch.zeros_like(pred)
        if gan_mode == "vanilla":
            return F.binary_cross_entropy_with_logits(pred, tgt)
        return F.mse_loss(pred, tgt)

    rng = np.random.default_rng(7)
    for k in range(K):
        a = rng.normal(size=(2, crop, crop, nc)).astype(np.float32)
        b = np.tanh(a + 0.3 * rng.normal(size=a.shape).astype(np.float32))
        state, losses, _ = step(
            state, {"A": jnp.asarray(a), "B": jnp.asarray(b)},
            jax.random.PRNGKey(100 + k),
        )

        At, Bt = _nchw(a), _nchw(b)
        fake = tG(At)
        # D first (reference optimize_parameters order)
        opt_D.zero_grad()
        loss_fake = gan(tD(torch.cat([At, fake.detach()], 1)), False)
        loss_real = gan(tD(torch.cat([At, Bt], 1)), True)
        (0.5 * (loss_fake + loss_real)).backward()
        opt_D.step()
        # G second, against the UPDATED D
        opt_G.zero_grad()
        loss_gan = gan(tD(torch.cat([At, fake], 1)), True)
        loss_l1 = F.l1_loss(fake, Bt) * cfg.lambda_L1
        (loss_gan + loss_l1).backward()
        opt_G.step()

        # per-step losses agree (f32 tolerance, drift grows with k)
        for name, ref in (
            ("D_fake", loss_fake), ("D_real", loss_real),
            ("G_GAN", loss_gan), ("G_L1", loss_l1),
        ):
            np.testing.assert_allclose(
                float(losses[name]), float(ref), rtol=2e-3, atol=2e-4,
                err_msg=f"step {k} loss {name}",
            )

    # evolved parameters agree (same init => this compares the K-step DELTA).
    # Layouts: conv flax HWIO vs torch OIHW -> transpose(2,3,1,0);
    #          convT flax HWIO vs torch IOHW -> transpose(2,3,0,1).
    atol, rtol = 3e-5, 2e-3
    gp = state.nets["G"]["params"]
    for i in range(num_downs):
        np.testing.assert_allclose(
            np.asarray(gp[f"down{i}"]["kernel"]),
            tG.downs[i].weight.detach().numpy().transpose(2, 3, 1, 0),
            rtol=rtol, atol=atol, err_msg=f"down{i} kernel after {K} steps",
        )
        np.testing.assert_allclose(
            np.asarray(gp[f"up{i}"]["kernel"]),
            tG.ups[str(i)].weight.detach().numpy().transpose(2, 3, 0, 1),
            rtol=rtol, atol=atol, err_msg=f"up{i} kernel after {K} steps",
        )
    dp = state.nets["D"]["params"]
    for n in range(n_layers + 1):
        np.testing.assert_allclose(
            np.asarray(dp[f"conv{n}"]["kernel"]),
            tD.convs[n].weight.detach().numpy().transpose(2, 3, 1, 0),
            rtol=rtol, atol=atol, err_msg=f"D conv{n} kernel after {K} steps",
        )
    np.testing.assert_allclose(
        np.asarray(dp["conv_out"]["kernel"]),
        tD.out.weight.detach().numpy().transpose(2, 3, 1, 0),
        rtol=rtol, atol=atol, err_msg=f"D out kernel after {K} steps",
    )
