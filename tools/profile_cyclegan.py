#!/usr/bin/env python
"""Break the CycleGAN 256^2 dual-G/D train step into timed pieces on the
real chip (same host-readback sync methodology as profile_step.py).

Usage: python tools/profile_cyclegan.py [batch] [dtype]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from biasgan_tpu.config import TrainConfig, merge_config_cls
from biasgan_tpu.models.cyclegan import (
    CycleGANConfig,
    build_nets,
    create_state,
    make_train_step,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
DTYPE = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
STEPS = 20


def timeit(name, fn, *args):
    out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(s.astype(jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(*args)
    s = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.sum(s.astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:40s} {dt*1e3:8.2f} ms   {BATCH/dt:8.1f} samples/s", flush=True)
    return dt


def main():
    cls = merge_config_cls(TrainConfig, CycleGANConfig)
    cfg = cls(
        model="cycle_gan", netG="resnet_9blocks", netD="basic",
        norm="instance", no_dropout=True, gan_mode="lsgan", pool_size=50,
        crop_size=256, input_nc=3, output_nc=3, batch_size=BATCH,
        ngf=64, ndf=64, steps_per_epoch=1000, compute_dtype=DTYPE,
        checkpoints_dir="/tmp/bgt_prof", name="prof_cg",
    )
    rng = jax.random.PRNGKey(0)
    state = create_state(cfg, rng)
    gs, ds = build_nets(cfg)
    G_A, D_A = gs["G_A"], ds["D_A"]
    a = jax.random.normal(jax.random.PRNGKey(1), (BATCH, 256, 256, 3), jnp.float32)
    b = jnp.tanh(a)
    gva, dva = state.nets["G_A"], state.nets["D_A"]
    print(f"batch={BATCH} dtype={DTYPE}", flush=True)

    # ONLY=gfwd,gbwd,dfwd,fused,plain selects pieces (each cold compile is
    # slow through the axon tunnel; the persistent cache deadlocks there)
    import os

    only = set((os.environ.get("ONLY") or "gfwd,gbwd,dfwd,fused,plain").split(","))

    if "gfwd" in only:
        g_fwd = jax.jit(lambda v, x: G_A.apply(v, x, False))
        t_gf = timeit("G fwd (1 pass)", g_fwd, gva, a)
        # resnet_9blocks fwd FLOPs at 256^2 ~= 96 GF/sample
        print(f"  -> G fwd MFU ~ {96e9 * BATCH / t_gf / 197e12 * 100:.0f}% of bf16 peak")

    if "gbwd" in only:
        def g_l1(params, v, x, y):
            out = G_A.apply({**v, "params": params}, x, False)
            return jnp.mean(jnp.abs(out - y))

        g_grad = jax.jit(lambda v, x, y: jax.grad(g_l1)(v["params"], v, x, y))
        t_gb = timeit("G fwd+bwd (L1 only)", g_grad, gva, a, b)
        print(f"  -> fwd+bwd MFU ~ {3 * 96e9 * BATCH / t_gb / 197e12 * 100:.0f}% of bf16 peak")

    if "dfwd" in only:
        d_fwd = jax.jit(lambda v, x: D_A.apply(v, x, False))
        timeit("D fwd (1 pass)", d_fwd, dva, a)

    if "fused" in only:
        step_fused = jax.jit(make_train_step(cfg, fuse_g=True))
        timeit("FULL step (fused G, 3 dispatches)", step_fused, state, {"A": a, "B": b}, rng)

    if "plain" in only:
        step_plain = jax.jit(make_train_step(cfg, fuse_g=False))
        timeit("FULL step (unfused G, 6 dispatches)", step_plain, state, {"A": a, "B": b}, rng)

    if "attrib" in only:
        attrib(cfg, state, a, b, rng)


def attrib(cfg, state, a, b, rng):
    """Forward/backward/optimizer attribution of the line-9 step (VERDICT r4
    item 6): cost-analysis FLOPs + bytes and measured time for (1) the
    6-pass G forward composite, (2) value_and_grad of the FULL G objective,
    (3) the D pair updates, (4) the full train step. Backward chain =
    (2) - (1) in both time and FLOPs -> achieved backward TF/s."""
    from biasgan_tpu import losses
    from biasgan_tpu.models.common import apply_net

    gs, ds = build_nets(cfg)
    G_A, G_B, D_A, D_B = gs["G_A"], gs["G_B"], ds["D_A"], ds["D_B"]
    nets = state.nets
    lam = cfg.lambda_A

    def g_forwards(g_params):
        gva = {**nets["G_A"], "params": g_params["G_A"]}
        gvb = {**nets["G_B"], "params": g_params["G_B"]}
        bsz = a.shape[0]
        out1, _ = apply_net(G_A, gva, jnp.concatenate([a, b]), True)
        fake_B, idt_A = out1[:bsz], out1[bsz:]
        out2, _ = apply_net(
            G_B, gvb, jnp.concatenate([b, fake_B, a]), True
        )
        fake_A, rec_A, idt_B = out2[:bsz], out2[bsz : 2 * bsz], out2[2 * bsz :]
        rec_B, _ = apply_net(G_A, gva, fake_A, True)
        return fake_B, rec_A, fake_A, rec_B, idt_A, idt_B

    def g_obj(g_params):
        fake_B, rec_A, fake_A, rec_B, idt_A, idt_B = g_forwards(g_params)
        pred_a, _ = apply_net(D_A, nets["D_A"], fake_B, True)
        pred_b, _ = apply_net(D_B, nets["D_B"], fake_A, True)
        return (
            losses.gan_loss(pred_a, True, cfg.gan_mode)
            + losses.gan_loss(pred_b, True, cfg.gan_mode)
            + losses.l1_loss(rec_A, a) * lam
            + losses.l1_loss(rec_B, b) * lam
            + losses.l1_loss(idt_A, b) * lam * cfg.lambda_identity
            + losses.l1_loss(idt_B, a) * lam * cfg.lambda_identity
        )

    def d_pairs(d_params):
        dva = {**nets["D_A"], "params": d_params["D_A"]}
        dvb = {**nets["D_B"], "params": d_params["D_B"]}
        pa, _ = apply_net(D_A, dva, jnp.concatenate([b, jnp.tanh(a)]), True)
        pb, _ = apply_net(D_B, dvb, jnp.concatenate([a, jnp.tanh(b)]), True)
        pra, pfa = jnp.split(pa, 2)
        prb, pfb = jnp.split(pb, 2)
        m = cfg.gan_mode
        return 0.5 * (
            losses.gan_loss(pra, True, m) + losses.gan_loss(pfa, False, m)
            + losses.gan_loss(prb, True, m) + losses.gan_loss(pfb, False, m)
        )

    g_params = {"G_A": nets["G_A"]["params"], "G_B": nets["G_B"]["params"]}
    d_params = {"D_A": nets["D_A"]["params"], "D_B": nets["D_B"]["params"]}

    def cost(fn, *args):
        c = jax.jit(fn).lower(*args).compile()
        ca = c.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        return c, ca.get("flops", float("nan")), ca.get(
            "bytes accessed", float("nan")
        )

    rows = []

    def run(name, fn, *args):
        c, fl, by = cost(fn, *args)
        t = timeit(name, c, *args)
        rows.append((name, t, fl, by))
        return t, fl, by

    t_f, f_f, b_f = run("G fwd composite (6 passes)", g_forwards, g_params)
    t_g, f_g, b_g = run(
        "G obj value_and_grad", lambda p: jax.value_and_grad(g_obj)(p), g_params
    )
    t_d, f_d, b_d = run(
        "D pairs value_and_grad", lambda p: jax.value_and_grad(d_pairs)(p),
        d_params,
    )
    step = make_train_step(cfg)
    t_s, f_s, b_s = run(
        "FULL train step", step, state, {"A": a, "B": b}, rng
    )
    print("\nattribution (cost analysis + measured):", flush=True)
    for name, t, fl, by in rows:
        print(f"  {name:28s}: {t*1e3:8.2f} ms  {fl/1e12:6.2f} TF  "
              f"{by/1e9:6.2f} GB  -> {fl/t/1e12:6.1f} TF/s  "
              f"{by/t/1e9:5.0f} GB/s", flush=True)
    tb, fb = t_g - t_f, f_g - f_f
    print(f"  {'G BACKWARD (obj - fwd)':28s}: {tb*1e3:8.2f} ms  "
          f"{fb/1e12:6.2f} TF  -> {fb/tb/1e12:6.1f} TF/s", flush=True)
    opt = t_s - t_g - t_d
    print(f"  optimizer+pools+rest (step - G - D): {opt*1e3:8.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
