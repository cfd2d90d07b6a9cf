#!/usr/bin/env python
"""Fused resnet-block conv (ops/pallas_conv.conv3x3_fused) on the real chip:
hardware parity vs the XLA composition, then link-level timing of the fused
chain (conv+prologue+moments) against XLA's pad+conv+instance_norm+relu at
the judged full-globe block shape (BASELINE.md r3 finding 4 follow-up).

Usage: python tools/bench_fused_block.py [N H W C] [--iters K]
Defaults to the globe block shape (1, 181, 360, 256) bf16.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from biasgan_tpu.nn.layers import instance_norm, pad_hw
from biasgan_tpu.ops.pallas_conv import (
    conv3x3_fused,
    fused_block_plan,
    instance_moments_to_affine,
)


def _ref_conv_same(x, kern, bias, h_mode, w_mode):
    xp = pad_hw(x, (1, 1), (1, 1), h_mode, w_mode)
    y = jax.lax.conv_general_dilated(
        xp, kern.astype(x.dtype), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("shape", nargs="*", type=int, default=[1, 181, 360, 256])
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--chain", type=int, default=0,
                    help="also time an N-block residual chain (whole-model "
                    "composition probe: block boundaries included)")
    ap.add_argument("--prepost", action="store_true",
                    help="time the standalone stem+downs / ups+head regions "
                    "of the globe G instead (non-block budget)")
    ap.add_argument("--layers", action="store_true",
                    help="per-layer breakdown of the pre/post regions "
                    "(each layer its own jit; exposes which op owns the "
                    "21 ms non-block budget)")
    ap.add_argument("--stages", action="store_true",
                    help="time the REAL ResNetGenerator's pre/blocks/post "
                    "stage jits at the globe shape (honors "
                    "BIASGAN_FUSED_BLOCK for the fused-vs-XLA region A/B). "
                    "Three fresh compiles — budget the tunnel accordingly; "
                    "use --only pre|blocks|post for one compile per command")
    ap.add_argument("--only", default="",
                    help="with --layers: run ONLY layers whose name contains "
                    "this substring. Each layer is a fresh XLA compile "
                    "through the remote service (~2-4 min) — on the tunnel, "
                    "run ONE layer per command so no timeout can kill a "
                    "compile mid-flight (device wedge hazard)")
    ap.add_argument("--downprobe", action="store_true",
                    help="isolated fused-down cost split at the globe "
                    "down1 shape (4 small compiles)")
    args = ap.parse_args()
    if args.downprobe:
        print(f"backend={jax.default_backend()}", flush=True)
        bench_downprobe(args.iters)
        return
    if args.stages:
        print(f"backend={jax.default_backend()}", flush=True)
        bench_stages(args.iters, only=args.only)
        return
    if args.prepost or args.layers:
        print(f"backend={jax.default_backend()}", flush=True)
        bench_prepost(args.iters, layers=args.layers, only=args.only)
        return
    n, h, w, c = args.shape or [1, 181, 360, 256]
    dt = jnp.dtype(args.dtype)
    print(f"backend={jax.default_backend()} shape=({n},{h},{w},{c}) {dt}")

    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (n, h, w, c), dt)
    kern = (jax.random.normal(k2, (3, 3, c, c)) * 0.05).astype(dt)
    bias = jax.random.normal(k3, (c,), jnp.float32) * 0.1

    plan = fused_block_plan(h, w, c, c, dt, interpret=False)
    print(f"plan: {plan}")
    xr = jnp.pad(x, ((0, 0), (0, plan.h_run - h), (0, 0), (0, 0)))

    # --- hardware parity -------------------------------------------------
    @jax.jit
    def fused_link(xr, kern, bias):
        y0, m0 = conv3x3_fused(
            xr, kern, bias, plan=plan, h_mode="reflect", w_mode="wrap",
            want_moments=True,
        )
        a0, b0 = instance_moments_to_affine(*m0, h * w)
        y1, m1 = conv3x3_fused(
            y0, kern, bias, prologue=(a0, b0), act_pre="relu", plan=plan,
            h_mode="reflect", w_mode="wrap", want_moments=True,
        )
        return y1, m1

    @jax.jit
    def xla_link(x, kern, bias):
        y0 = _ref_conv_same(x, kern, bias, "reflect", "wrap")
        z = jax.nn.relu(instance_norm(y0))
        y1 = _ref_conv_same(z, kern, bias, "reflect", "wrap")
        return y1

    y1f, _ = fused_link(xr, kern, bias)
    y1x = xla_link(x, kern, bias)
    d = np.abs(
        np.asarray(y1f[:, :h], np.float32) - np.asarray(y1x, np.float32)
    )
    scale = float(np.abs(np.asarray(y1x, np.float32)).max())
    print(f"parity: max abs diff {d.max():.3e} (ref max {scale:.3e})")
    if d.max() > max(2e-2 * scale, 5e-2):
        print("PARITY FAIL — do not trust timings")
        sys.exit(1)

    # --- timing ----------------------------------------------------------
    def timeit(fn, *a):
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / args.iters

    tf = timeit(fused_link, xr, kern, bias)
    tx = timeit(xla_link, x, kern, bias)
    fl = 2 * 2 * n * h * w * c * c * 9  # two convs
    print(
        f"fused link : {tf*1e3:7.3f} ms  {fl/tf/1e12:6.1f} TF/s\n"
        f"xla link   : {tx*1e3:7.3f} ms  {fl/tx/1e12:6.1f} TF/s\n"
        f"speedup    : {tx/tf:5.2f}x"
    )

    if args.chain:
        nb = args.chain

        @jax.jit
        def fused_chain(xr, kern, bias):
            hh = xr
            for _ in range(nb):
                y0, m0 = conv3x3_fused(
                    hh, kern, bias, plan=plan, h_mode="reflect",
                    w_mode="wrap", want_moments=True,
                )
                a0, b0 = instance_moments_to_affine(*m0, h * w)
                y1, m1 = conv3x3_fused(
                    y0, kern, bias, prologue=(a0, b0), act_pre="relu",
                    plan=plan, h_mode="reflect", w_mode="wrap",
                    want_moments=True,
                )
                a1, b1 = instance_moments_to_affine(*m1, h * w)
                hh = (
                    y1.astype(jnp.float32) * a1[:, None, None, :]
                    + b1[:, None, None, :]
                ).astype(y1.dtype) + hh
            return hh

        @jax.jit
        def xla_chain(x, kern, bias):
            hh = x
            for _ in range(nb):
                y0 = _ref_conv_same(hh, kern, bias, "reflect", "wrap")
                z = jax.nn.relu(instance_norm(y0))
                y1 = _ref_conv_same(z, kern, bias, "reflect", "wrap")
                hh = instance_norm(y1) + hh
            return hh

        tfc = timeit(fused_chain, xr, kern, bias)
        txc = timeit(xla_chain, x, kern, bias)
        flc = 2 * 2 * n * h * w * c * c * 9 * nb
        print(
            f"fused {nb}-block chain : {tfc*1e3:7.3f} ms "
            f"{flc/tfc/1e12:6.1f} TF/s\n"
            f"xla   {nb}-block chain : {txc*1e3:7.3f} ms "
            f"{flc/txc/1e12:6.1f} TF/s\n"
            f"chain speedup      : {txc/tfc:5.2f}x"
        )


def bench_stages(iters: int, only: str = ""):
    """Time the real globe ResNetGenerator's three stage jits at
    (1, 724, 1440, 3) bf16 — pre (stem+downs), blocks, post (ups+head).
    BIASGAN_FUSED_BLOCK in the env selects the fused or XLA path, so two
    invocations give the region-level A/B that attributes the whole-model
    delta."""
    import os
    from functools import partial

    sys.path.insert(0, ".")
    from biasgan_tpu.nn import define_G, init_params

    print(f"BIASGAN_FUSED_BLOCK={os.environ.get('BIASGAN_FUSED_BLOCK', '')}",
          flush=True)
    G = define_G("resnet_9blocks", output_nc=3, ngf=64, norm="instance",
                 w_mode="wrap", compute_dtype=jnp.bfloat16,
                 out_activation="none")
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 724, 1440, 3))
    v = init_params(G, jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)))

    @partial(jax.jit, static_argnames="stage")
    def run(v, h, stage):
        return G.apply(v, h, False, stage=stage)

    def timeit(fn, *a):
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters, out

    order = ("pre", "blocks", "post")
    h = x
    total = 0.0
    for idx, stage in enumerate(order):
        if only and stage != only:
            if idx < order.index(only):
                h = run(v, h, stage)  # produce the measured stage's input
            continue
        t, out = timeit(run, v, h, stage)
        h = out
        total += t
        print(f"stage {stage:7s}: {t*1e3:7.3f} ms", flush=True)
        if only:
            return
    print(f"stage total  : {total*1e3:7.3f} ms")


def bench_downprobe(iters: int):
    """Isolated cost split of the fused DOWN kernel at the globe down1
    shape (1, 362, 720, 128 -> 256) bf16: (a) full kernel w/ prologue,
    (b) kernel w/o prologue, (c) the XLA phase-split glue alone,
    (d) XLA reference conv s2 + IN + relu. Attributes the measured
    pre-region loss (BASELINE.md r3) to kernel vs glue vs prologue."""
    from biasgan_tpu.nn.layers import instance_norm, pad_hw
    from biasgan_tpu.ops.pallas_conv import (
        conv3x3s2_fused,
        conv3x3s2_plan,
        instance_moments_to_affine,
    )

    n, h, w, c, cout = 1, 362, 720, 128, 256
    dt = jnp.bfloat16
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    x = jax.random.normal(k1, (n, h, w, c), dt)
    kern = (jax.random.normal(k2, (3, 3, c, cout)) * 0.05).astype(dt)
    bias = jax.random.normal(k3, (cout,), jnp.float32) * 0.1
    xf = x.astype(jnp.float32)
    a, b = instance_moments_to_affine(
        xf.sum((1, 2)), (xf * xf).sum((1, 2)), h * w
    )
    plan = conv3x3s2_plan(h, w, c, cout, dt, interpret=False)
    print(f"plan: {plan}", flush=True)

    def timeit(fn, *args_):
        out = fn(*args_)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args_)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    @jax.jit
    def full(x, kern, bias, a, b):
        return conv3x3s2_fused(
            x, kern, bias, prologue=(a, b), plan=plan, w_mode="wrap"
        )

    @jax.jit
    def noprol(x, kern, bias):
        return conv3x3s2_fused(x, kern, bias, plan=plan, w_mode="wrap")

    @jax.jit
    def glue(x):
        # HISTORICAL probe: the v2 kernel's XLA stack+pad input pass,
        # measured 1.9 ms standalone (as much as the whole XLA layer) —
        # the current kernel DMAs straight from the contiguous bitcast
        # view, so this pass no longer exists in the product path
        h2, w2 = h // 2, w // 2
        xv = x.reshape(n, h2, 2, w2, 2 * c)
        planes = jnp.stack([xv[:, :, 0], xv[:, :, 1]], axis=1)
        if plan.h_run > h2:
            planes = jnp.pad(
                planes,
                ((0, 0), (0, 0), (0, plan.h_run - h2), (0, 0), (0, 0)),
            )
        return planes

    @jax.jit
    def xla_ref(x, kern, bias, a, b):
        z = jax.nn.relu(
            x.astype(jnp.float32) * a[:, None, None, :] + b[:, None, None, :]
        ).astype(x.dtype)
        xp = pad_hw(z, (1, 1), (1, 1), "zero", "wrap")
        y = jax.lax.conv_general_dilated(
            xp, kern.astype(x.dtype), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bias.astype(jnp.float32)
        return jax.nn.relu(instance_norm(y.astype(x.dtype)))

    for name, fn, args_ in (
        ("xla conv+IN+relu  ", xla_ref, (x, kern, bias, a, b)),
        ("glue (split+pad)  ", glue, (x,)),
        ("kernel w/o prolog ", noprol, (x, kern, bias)),
        ("kernel + prologue ", full, (x, kern, bias, a, b)),
    ):
        t = timeit(fn, *args_)
        print(f"{name}: {t*1e3:7.3f} ms", flush=True)


def bench_prepost(iters: int, layers: bool = False, only: str = ""):
    """Standalone stem+downs ('pre') and ups+head ('post') of the globe
    resnet_9blocks G — the NON-block budget. Compares against
    (whole-model time - block-chain time) to expose any cross-region
    slowdown XLA introduces when opaque pallas calls sit between them.
    ``layers``: additionally time every layer of both regions standalone."""
    from flax import linen as nn_
    from biasgan_tpu.nn.layers import Conv2d, ConvTranspose2d, norm_act

    cd = jnp.bfloat16

    class Pre(nn_.Module):
        @nn_.compact
        def __call__(self, x):
            h = Conv2d(64, (7, 7), padding=(3, 3), h_mode="reflect",
                       w_mode="wrap", compute_dtype=cd, name="stem")(x)
            h = norm_act(h, "instance", "sn", activation="relu", dtype=cd)
            for i in range(2):
                h = Conv2d(64 * 2 ** (i + 1), (3, 3), strides=(2, 2),
                           padding=(1, 1), w_mode="wrap", compute_dtype=cd,
                           name=f"down{i}")(h)
                h = norm_act(h, "instance", f"dn{i}", activation="relu",
                             dtype=cd)
            return h

    class Post(nn_.Module):
        @nn_.compact
        def __call__(self, h):
            for i in range(2):
                h = ConvTranspose2d(64 * 2 ** (1 - i), (3, 3), strides=(2, 2),
                                    padding=(1, 1), output_padding=(1, 1),
                                    w_mode="wrap", compute_dtype=cd,
                                    name=f"up{i}")(h)
                h = norm_act(h, "instance", f"un{i}", activation="relu",
                             dtype=cd)
            return Conv2d(3, (7, 7), padding=(3, 3), h_mode="reflect",
                          w_mode="wrap", compute_dtype=cd, name="head")(h)

    def timeit(fn, *a):
        out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*a)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
        return (time.perf_counter() - t0) / iters

    if not layers:
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 724, 1440, 3))
        pre = Pre()
        vp = pre.init(jax.random.PRNGKey(1), x)
        t_pre = timeit(jax.jit(pre.apply), vp, x)
        hmid = jax.random.normal(jax.random.PRNGKey(2), (1, 181, 360, 256),
                                 jnp.bfloat16)
        post = Post()
        vq = post.init(jax.random.PRNGKey(3), hmid)
        t_post = timeit(jax.jit(post.apply), vq, hmid)
        print(f"pre (stem+downs)   : {t_pre*1e3:7.3f} ms\n"
              f"post (ups+head)    : {t_post*1e3:7.3f} ms\n"
              f"pre+post           : {(t_pre+t_post)*1e3:7.3f} ms")
        return

    class OneLayer(nn_.Module):
        """One pre/post layer + its norm_act, jitted standalone."""
        kind: str      # 'conv' | 'convT'
        feats: int
        ksize: int = 3
        stride: int = 1
        h_mode: str = "zero"
        act: bool = True

        @nn_.compact
        def __call__(self, h):
            p = self.ksize // 2
            if self.kind == "conv":
                h = Conv2d(self.feats, (self.ksize, self.ksize),
                           strides=(self.stride, self.stride),
                           padding=(p, p), h_mode=self.h_mode, w_mode="wrap",
                           compute_dtype=cd, name="l")(h)
            else:
                h = ConvTranspose2d(self.feats, (3, 3), strides=(2, 2),
                                    padding=(1, 1), output_padding=(1, 1),
                                    w_mode="wrap", compute_dtype=cd,
                                    name="l")(h)
            if self.act:
                h = norm_act(h, "instance", "n", activation="relu", dtype=cd)
            return h

    shapes = [
        ("stem 7x7 3->64 @724x1440", "conv", 64, 7, 1, "reflect", True,
         (1, 724, 1440, 3), jnp.float32),
        ("down0 3x3s2 64->128 @724x1440", "conv", 128, 3, 2, "zero", True,
         (1, 724, 1440, 64), cd),
        ("down1 3x3s2 128->256 @362x720", "conv", 256, 3, 2, "zero", True,
         (1, 362, 720, 128), cd),
        ("up0 convT 256->128 @181x360", "convT", 128, 3, 2, "zero", True,
         (1, 181, 360, 256), cd),
        ("up1 convT 128->64 @362x720", "convT", 64, 3, 2, "zero", True,
         (1, 362, 720, 128), cd),
        ("head 7x7 64->3 @724x1440", "conv", 3, 7, 1, "reflect", False,
         (1, 724, 1440, 64), cd),
    ]
    total = 0.0
    for name, kind, feats, ks, st, hm, act, shp, dt in shapes:
        if only and only not in name:
            continue
        m = OneLayer(kind=kind, feats=feats, ksize=ks, stride=st,
                     h_mode=hm, act=act)
        hx = jax.random.normal(jax.random.PRNGKey(7), shp, dt)
        vv = m.init(jax.random.PRNGKey(8), hx)
        t = timeit(jax.jit(m.apply), vv, hx)
        total += t
        print(f"{name:34s}: {t*1e3:7.3f} ms", flush=True)
    print(f"{'sum of layers':34s}: {total*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
