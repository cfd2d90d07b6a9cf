#!/usr/bin/env python
"""Full-field inference driver: apply a trained generator to whole global
grids (e.g. 721x1440 multi-channel) in ONE jitted call, spatially sharded
over the device mesh with halo exchange (BASELINE.json line 10).

  python infer.py --model pix2pix --dataset_mode climate --full_field \
      --spatial_mesh 4 --w_pad_mode wrap --netG resnet_9blocks ...

How it works (parallel/spatial.py): the longitude axis is sharded over the
mesh; every conv exchanges exactly its kernel-margin halo with ring neighbors
over ICI, instance norms pmean their statistics — so the sharded forward is
numerically the whole-field forward, not a tile approximation. The field is
padded (periodic wrap) to a multiple of n_shards * 2^n_downs and cropped
back after.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu import enable_compile_cache, respect_platform_env

respect_platform_env()
enable_compile_cache()
from biasgan_tpu.config import format_config, parse_config, save_config
from biasgan_tpu.data import create_dataset
from biasgan_tpu.models import create_model
from biasgan_tpu.parallel import make_mesh, pad_to_multiple, spatial_apply
from biasgan_tpu.utils.imaging import save_field


def generator_downs(netG: str) -> int:
    """Stride-product exponent of the generator (for shard divisibility)."""
    import re

    m = re.fullmatch(r"unet_d(\d+)", netG)
    if m:
        return int(m.group(1))
    downs = {"unet_256": 8, "unet_128": 7, "unet_64": 6, "unet_32": 5}
    if netG in downs:
        return downs[netG]
    if netG.startswith("resnet"):
        return 2
    raise ValueError(netG)


def main(argv=None):
    cfg = parse_config(argv, train=False)
    print(format_config(cfg))
    save_config(cfg)
    dataset = create_dataset(cfg)
    model = create_model(cfg)
    model.setup()

    n_spatial = max(cfg.spatial_mesh, 1)
    mesh = make_mesh(data=1, spatial=n_spatial)
    periodic = (cfg.w_pad_mode or "wrap") == "wrap"
    multiple = n_spatial * 2 ** generator_downs(cfg.netG)

    # G-only forward, sharded over longitude
    g_module = model._build_g() if hasattr(model, "_build_g") else None
    if g_module is None:
        from biasgan_tpu.models.pix2pix import build_nets

        g_module, _ = build_nets(cfg)
    # honor --direction: pix2pix has one G trained for the configured
    # direction; CycleGAN checkpoints hold G_A (A->B) and G_B (B->A)
    btoa = cfg.direction == "BtoA"
    nets = model.state.nets
    g_key = "G" if "G" in nets else ("G_B" if btoa else "G_A")
    g_vars = nets[g_key]
    # source/target field + stats pairing follows the direction too
    src, tgt = ("B", "A") if btoa else ("A", "B")
    # checkpoint-restored arrays are committed to one device; replicate them
    # over the spatial mesh or jit refuses the mixed device assignment
    from jax.sharding import NamedSharding, PartitionSpec

    g_vars = jax.device_put(g_vars, NamedSharding(mesh, PartitionSpec()))

    h_multiple = 2 ** generator_downs(cfg.netG)

    from biasgan_tpu.data.transforms import standardize

    fused_ok = cfg.fused_blocks and cfg.netG.startswith("resnet")
    if cfg.fused_blocks and not fused_ok:
        # the flag must never be silently ignored (a user benchmarking with
        # it would otherwise time the plain path with no hint)
        print(
            f"--fused_blocks: ignored — netG {cfg.netG!r} has no resnet "
            "block chain; using the plain path"
        )
    # single-chip: staged pre/blocks/post dispatch (measured optimum).
    # sharded: the fused kernels compose with the halo exchange in-graph
    # (w_mode='halo' + W-global psum moments) inside ONE spatial_apply jit.
    use_fused = fused_ok and n_spatial == 1
    if fused_ok:
        from biasgan_tpu import perf_gates

        if perf_gates.fused_blocks_engage():
            # block-resolution local width must be 8-aligned for the fused
            # kernels (W / (2^downs * n_shards) % 8) — on the sharded AND
            # the single-chip staged path (previously only the sharded
            # branch widened, so an unaligned single-chip width silently
            # timed the plain path); widen the wrap pad — the rim is
            # cropped after the forward
            multiple = n_spatial * 2 ** generator_downs(cfg.netG) * 8
    if use_fused:
        # Fused-block single-chip path: the residual-block chain runs the
        # Pallas fused conv kernels (in-kernel SAME pad + instance-norm
        # prologue + moments, ops/pallas_conv.py), and the generator is
        # dispatched as THREE jit calls — stem+downs / blocks / ups+head —
        # because a single jit with opaque pallas calls mid-graph carries a
        # measured ~9 ms/field cross-region scheduling penalty (BASELINE.md
        # r3 fused-block section; async dispatch hides the extra enqueues).
        # Kernel engagement is still the generator's own eligibility gate
        # (instance norm, no dropout, W%8, C>=128) — ineligible configs run
        # this staged dispatch on the plain XLA path, same numerics. The
        # env gate itself was opened (or the fallback notice printed) by
        # perf_gates.fused_blocks_engage above.
        from functools import partial

        @jax.jit
        def run_pre(variables, x, a_mean, a_std):
            x = standardize(x, a_mean, a_std)
            xp, _ = pad_to_multiple(x, h_multiple, axis=1, mode="reflect")
            xp, _ = pad_to_multiple(xp, multiple, axis=2, mode="wrap")
            return g_module.apply(variables, xp, False, stage="pre")

        # the staged intermediates are single-use: donate them so XLA reuses
        # their HBM pages instead of allocating fresh output buffers
        @partial(jax.jit, donate_argnums=(1,))
        def run_blocks(variables, h):
            return g_module.apply(variables, h, False, stage="blocks")

        @partial(jax.jit, static_argnames=("h0", "w0"), donate_argnums=(1,))
        def run_post(variables, h, b_mean, b_std, h0, w0):
            y = g_module.apply(variables, h, False, stage="post")
            return standardize(y[:, :h0, :w0, :], b_mean, b_std, inverse=True)

        def run(variables, x, a_mean, a_std, b_mean, b_std):
            h = run_pre(variables, x, a_mean, a_std)
            h = run_blocks(variables, h)
            return run_post(
                variables, h, b_mean, b_std, x.shape[1], x.shape[2]
            )

    else:
        fwd = spatial_apply(
            g_module, mesh, train=False, periodic=periodic,
            rdma=cfg.halo_rdma,
        )

        @jax.jit
        def run(variables, x, a_mean, a_std, b_mean, b_std):
            # standardize with source-domain stats (training-time semantics:
            # prepare_batch does the same in-graph inside the train step),
            # destandardize the corrected field to target-domain physical
            # units
            x = standardize(x, a_mean, a_std)
            # latitude is not periodic: reflect-pad H; longitude wraps
            xp, h0 = pad_to_multiple(x, h_multiple, axis=1, mode="reflect")
            xp, w0 = pad_to_multiple(xp, multiple, axis=2, mode="wrap")
            y = fwd(variables, xp)[:, :h0, :w0, :]
            return standardize(y, b_mean, b_std, inverse=True)

    out_dir = os.path.join(cfg.results_dir, cfg.resolved_name(), "fields")
    os.makedirs(out_dir, exist_ok=True)
    for i, data in enumerate(dataset):
        if cfg.num_test and i >= cfg.num_test:
            break
        sk = src if src in data else "A"  # single-sided datasets yield A only
        tk = tgt if f"{tgt}_mean" in data else sk
        x = jnp.asarray(data[sk])
        nc = x.shape[-1]
        ident = (jnp.zeros((nc,)), jnp.ones((nc,)))
        a_mean, a_std = (
            (jnp.asarray(data[f"{sk}_mean"][0]), jnp.asarray(data[f"{sk}_std"][0]))
            if f"{sk}_mean" in data
            else ident
        )
        b_mean, b_std = (
            (jnp.asarray(data[f"{tk}_mean"][0]), jnp.asarray(data[f"{tk}_std"][0]))
            if f"{tk}_mean" in data
            else ident
        )
        t0 = time.time()
        y = np.asarray(run(g_vars, x, a_mean, a_std, b_mean, b_std))
        dt = time.time() - t0
        px_per_s = (y.shape[1] * y.shape[2] * y.shape[0]) / dt
        print(
            f"[{i:04d}] field {x.shape} -> corrected in {dt*1e3:.1f} ms "
            f"({px_per_s/1e6:.1f} Mpx/s)"
        )
        save_field(y, os.path.join(out_dir, f"corrected_{i:05d}.npy"))
    return out_dir


if __name__ == "__main__":
    main(sys.argv[1:])
