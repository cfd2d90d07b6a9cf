"""CycleGAN: unpaired sim<->obs bias correction.

Capability parity with the reference's ``CycleGANModel``
(models/cycle_gan_model.py, SURVEY.md sections 2.2 and 3.2 [K]):

  forward: fake_B = G_A(A); rec_A = G_B(fake_B); fake_A = G_B(B); rec_B = G_A(fake_A)
  G step (Ds held constant — reference freezes them):
      GAN(D_A(fake_B)) + GAN(D_B(fake_A))
    + lambda_A * L1(rec_A, A) + lambda_B * L1(rec_B, B)
    + lambda_idt * (lambda_B * L1(G_A(B), B) + lambda_A * L1(G_B(A), A))
    one shared Adam over G_A + G_B params
  D step (after G, reference order): each D sees real vs. a POOL-replayed
    fake (ImagePool(50) decorrelation), 0.5-weighted; one shared Adam over
    D_A + D_B.
  defaults (modify_commandline_options): resnet_9blocks G, instance norm,
  no dropout, unaligned dataset, lsgan.

TPU-native: one jitted step; the replay pools are in-graph pytree state
(utils/image_pool.py); "set_requires_grad(D, False)" is simply
differentiating the G loss w.r.t. G params only.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from biasgan_tpu import losses
from biasgan_tpu.models import base
from biasgan_tpu.models.common import (
    GANTrainState,
    adam_transform_of,
    apply_adam_update,
    apply_net,
    aug_key,
    compute_dtype_of,
    init_state,
    make_lr_schedule,
    pmean_if,
    prepare_batch,
    resolve_direction,
)
from biasgan_tpu.nn import define_D, define_G, init_params
from biasgan_tpu.registry import register_model
from biasgan_tpu.utils.image_pool import create_pool, pool_query

Array = jax.Array


@dataclass
class CycleGANConfig:
    lambda_A: float = 10.0
    lambda_B: float = 10.0
    lambda_identity: float = 0.5


def build_nets(cfg):
    dtype = compute_dtype_of(cfg)

    def g(out_nc):
        return define_G(
            cfg.netG,
            output_nc=out_nc,
            ngf=cfg.ngf,
            norm=cfg.norm,
            use_dropout=cfg.dropout(),
            init_type=cfg.init_type,
            init_gain=cfg.init_gain,
            w_mode=cfg.w_pad_mode or None,
            compute_dtype=dtype,
            out_activation=getattr(cfg, "netG_activation", "tanh"),
        )

    def d():
        return define_D(
            cfg.netD,
            ndf=cfg.ndf,
            n_layers_D=cfg.n_layers_D,
            norm=cfg.norm,
            init_type=cfg.init_type,
            init_gain=cfg.init_gain,
            w_mode=cfg.w_pad_mode or "zero",
            compute_dtype=dtype,
        )

    # G_A: A->B, G_B: B->A; D_A judges B-domain, D_B judges A-domain
    return {"G_A": g(cfg.output_nc), "G_B": g(cfg.input_nc)}, {"D_A": d(), "D_B": d()}


def create_state(cfg, rng: Array) -> GANTrainState:
    """Train configs build both Gs + both Ds + optimizers + pools; test
    configs build the Gs only — reference semantics (CycleGANModel's
    model_names is ['G_A','G_B'] under isTrain=False), which also lets
    test.py restore without knowing the training-time --ndf/--netD."""
    from biasgan_tpu.config import is_train_config

    gs, ds = build_nets(cfg)
    h = w = cfg.crop_size
    keys = jax.random.split(rng, 4)
    xa = jnp.zeros((1, h, w, cfg.input_nc))
    xb = jnp.zeros((1, h, w, cfg.output_nc))
    nets = {
        "G_A": dict(init_params(gs["G_A"], keys[0], xa, train=True)),
        "G_B": dict(init_params(gs["G_B"], keys[1], xb, train=True)),
    }
    if not is_train_config(cfg):
        return init_state(nets=nets, opt_map={})
    nets["D_A"] = dict(init_params(ds["D_A"], keys[2], xb, train=True))
    nets["D_B"] = dict(init_params(ds["D_B"], keys[3], xa, train=True))
    tx = adam_transform_of(cfg)
    pools = {}
    if getattr(cfg, "pool_size", 0) > 0:
        pools = {
            "fake_B": create_pool(cfg.pool_size, (h, w, cfg.output_nc)),
            "fake_A": create_pool(cfg.pool_size, (h, w, cfg.input_nc)),
        }
    return init_state(
        nets=nets,
        opt_map={
            "G": (tx, {"G_A": nets["G_A"]["params"], "G_B": nets["G_B"]["params"]}),
            "D": (tx, {"D_A": nets["D_A"]["params"], "D_B": nets["D_B"]["params"]}),
        },
        pools=pools,
    )


def make_train_step(
    cfg,
    axis_name=None,
    fuse_g: Optional[bool] = None,
    debug_grads: bool = False,
    ctx=None,
):
    """Build the jitted CycleGAN step. ``debug_grads`` adds the raw G/D
    gradient pytrees to the visuals dict (fused-vs-unfused equivalence
    tests; never used in training).

    ``axis_name`` may be a mesh axis or tuple of axes ('data', 'spatial');
    ``ctx`` is a HaloCtx when the W axis is sharded (spatial training): the
    Gs run halo-exchanged and sharded, PatchGAN Ds on the all-gathered field
    (their stride-1 4x4 convs shrink W — see models/pix2pix.py), and the
    replay pools hold W-SHARDED fakes (pool queries act on the batch axis
    only, so sharded pool state composes transparently;
    parallel/spatial.py::spatial_train_step shards their specs)."""
    # batch norm under spatial sharding is supported: the Gs' norms pmean
    # their moments over the spatial axis (nn/layers.py Norm) and the
    # PatchGAN Ds run on gathered full-W fields — exact whole-field
    # semantics at any --norm.
    gs, ds = build_nets(cfg)
    G_A, G_B, D_A, D_B = gs["G_A"], gs["G_B"], ds["D_A"], ds["D_B"]
    tx_g = adam_transform_of(cfg)
    tx_d = adam_transform_of(cfg)
    lr_fn = make_lr_schedule(cfg)
    gan_mode = cfg.gan_mode
    lam_A, lam_B, lam_idt = cfg.lambda_A, cfg.lambda_B, cfg.lambda_identity
    use_pool = getattr(cfg, "pool_size", 0) > 0
    # real+fake D passes fuse into ONE 2B-batch pass (better MXU utilization)
    # when the D has no batch norm — exact for instance/none norms; batch
    # norm computes per-pass batch statistics, so fusing would change the
    # reference's training semantics there.
    fuse_d = cfg.norm != "batch"
    # Same gate for the G loss: the reference's 6 generator passes
    # (fake_B, rec_A, fake_A, rec_B, idt_A, idt_B — SURVEY.md section 3.2)
    # restructure into THREE batched dispatches ordered by data dependency:
    #   G_A([real_A; real_B])         -> [fake_B, idt_A]
    #   G_B([real_B; fake_B; real_A]) -> [fake_A, rec_A, idt_B]
    #   G_A(fake_A)                   -> rec_B
    # Instance norm is per-sample, so batching the passes is semantically
    # exact (tests/unit/test_cyclegan_fused.py asserts losses and grads match
    # the unfused path); batch norm is per-pass, so it keeps the
    # reference-faithful 6-pass path. Dropout also gates the fusion: the
    # fused concat pass draws per-sub-batch masks that differ from 6
    # separate passes' draws (distribution-equivalent but not draw-exact),
    # so with dropout enabled the unfused path runs. CycleGAN's reference
    # default is --no_dropout, so the fast path is the default path.
    if fuse_g is None:
        fuse_g = cfg.norm != "batch" and not cfg.dropout()

    def train_step(
        state: GANTrainState, batch: Dict[str, Array], rng: Array
    ) -> Tuple[GANTrainState, Dict[str, Array], Dict[str, Array]]:
        # pool rngs come from the PRE-shard-fold rng: under data parallelism
        # the pools are REPLICATED state (out_specs P()), so every shard must
        # apply the identical pool update (see the D-step pool block below).
        rng_pool_a, rng_pool_b, rng_local = jax.random.split(rng, 3)
        # aug key off the TOP rng via a constant fold (common.py aug_key):
        # disjoint from every split-derived stream, and identical to the
        # wrapper-level key spatial_train_step uses — so spatial and
        # single-device training draw the same augmentations
        rng_aug = aug_key(rng)
        names = () if axis_name is None else (
            (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
        )
        if "data" in names:
            # per-data-shard dropout/aug; spatial shards share one rng
            # (slices of the SAME fields)
            idx = jax.lax.axis_index("data")
            rng_local = jax.random.fold_in(rng_local, idx)
            rng_aug = jax.random.fold_in(rng_aug, idx)
        rng_drop = jax.random.split(rng_local)[0]
        batch = prepare_batch(
            batch, rng_aug, cfg, train=True, skip_aug=ctx is not None
        )
        real_A, real_B = resolve_direction(batch, cfg.direction)
        nets = state.nets
        drop = {"dropout": rng_drop}
        lr = lr_fn(state.step, state.lr_scale)

        # Under spatial sharding the Gs stay sharded; PatchGAN Ds see the
        # all-gathered W (their final stride-1 convs shrink W by 1 — cannot
        # shard uniformly; same design + gradient-factor analysis as
        # models/pix2pix.py). 1x1 'pixel' Ds stay fully sharded.
        d_ctx = ctx
        gather_w = None
        if ctx is not None and cfg.netD != "pixel":
            d_ctx = None

            def gather_w(t):
                return jax.lax.all_gather(t, ctx.axis, axis=2, tiled=True)

        def for_d(t):
            return gather_w(t) if gather_w is not None else t

        # ---- G update (first, reference order; Ds constant) ----
        def g_forwards(gva, gvb):
            """The 6 reference G passes, as 3 batched dispatches when the
            norm allows (fuse_g) else verbatim."""
            b = real_A.shape[0]
            if fuse_g:
                in1 = (
                    jnp.concatenate([real_A, real_B]) if lam_idt > 0 else real_A
                )
                out1, gva = apply_net(G_A, gva, in1, True, drop, ctx)
                fake_B = out1[:b]
                idt_A = out1[b:] if lam_idt > 0 else None
                in2 = [real_B, fake_B] + ([real_A] if lam_idt > 0 else [])
                out2, gvb = apply_net(G_B, gvb, jnp.concatenate(in2), True, drop, ctx)
                fake_A, rec_A = out2[:b], out2[b : 2 * b]
                idt_B = out2[2 * b :] if lam_idt > 0 else None
                rec_B, gva = apply_net(G_A, gva, fake_A, True, drop, ctx)
            else:
                fake_B, gva = apply_net(G_A, gva, real_A, True, drop, ctx)
                rec_A, gvb = apply_net(G_B, gvb, fake_B, True, drop, ctx)
                fake_A, gvb = apply_net(G_B, gvb, real_B, True, drop, ctx)
                rec_B, gva = apply_net(G_A, gva, fake_A, True, drop, ctx)
                idt_A = idt_B = None
                if lam_idt > 0:
                    idt_A, gva = apply_net(G_A, gva, real_B, True, drop, ctx)
                    idt_B, gvb = apply_net(G_B, gvb, real_A, True, drop, ctx)
            return fake_B, rec_A, fake_A, rec_B, idt_A, idt_B, gva, gvb

        def g_loss_fn(g_params):
            gva = {**nets["G_A"], "params": g_params["G_A"]}
            gvb = {**nets["G_B"], "params": g_params["G_B"]}
            fake_B, rec_A, fake_A, rec_B, idt_A, idt_B, gva, gvb = g_forwards(
                gva, gvb
            )
            if lam_idt > 0:
                loss_idt_A = losses.l1_loss(idt_A, real_B) * lam_B * lam_idt
                loss_idt_B = losses.l1_loss(idt_B, real_A) * lam_A * lam_idt
            else:
                loss_idt_A = loss_idt_B = jnp.zeros(())
            pred_a, _ = apply_net(D_A, nets["D_A"], for_d(fake_B), True, ctx=d_ctx)
            pred_b, _ = apply_net(D_B, nets["D_B"], for_d(fake_A), True, ctx=d_ctx)
            loss_G_A = losses.gan_loss(pred_a, True, gan_mode)
            loss_G_B = losses.gan_loss(pred_b, True, gan_mode)
            loss_cycle_A = losses.l1_loss(rec_A, real_A) * lam_A
            loss_cycle_B = losses.l1_loss(rec_B, real_B) * lam_B
            loss = (
                loss_G_A + loss_G_B + loss_cycle_A + loss_cycle_B
                + loss_idt_A + loss_idt_B
            )
            aux = dict(
                G_A=loss_G_A, G_B=loss_G_B,
                cycle_A=loss_cycle_A, cycle_B=loss_cycle_B,
                idt_A=loss_idt_A, idt_B=loss_idt_B,
                fake_B=fake_B, fake_A=fake_A, rec_A=rec_A, rec_B=rec_B,
                gva=gva, gvb=gvb,
            )
            return loss, aux

        g_params = {"G_A": nets["G_A"]["params"], "G_B": nets["G_B"]["params"]}
        (_, gaux), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(g_params)
        g_grads = pmean_if(g_grads, axis_name)
        g_params_new, g_opt_new = apply_adam_update(
            g_params, g_grads, state.opts["G"], tx_g, lr
        )

        fake_B = jax.lax.stop_gradient(gaux["fake_B"])
        fake_A = jax.lax.stop_gradient(gaux["fake_A"])

        # ---- replay pools (in-graph; reference ImagePool.query) ----
        # Under data parallelism the pool is REPLICATED (out_specs P()), so
        # it must see the identical update on every shard: all_gather the
        # full global batch of fakes, query with the shared (pre-fold) pool
        # rng, and slice back this shard's portion — exactly the reference's
        # single pool fed by the whole batch.
        pools = dict(state.pools)
        if use_pool:

            # the gather/scatter rides the DATA axis only: across spatial
            # shards the pool is W-SHARDED state (each shard stores its own
            # W slice of every pooled fake — queries index the batch axis,
            # identical on every spatial shard via the shared pool rng)
            data_axis = "data" if "data" in names else None

            def query(pool, fake, prng):
                if data_axis is None:
                    return pool_query(pool, fake, prng)
                b_local = fake.shape[0]
                fake_g = jax.lax.all_gather(fake, data_axis)  # (n, B_l, ...)
                fake_g = fake_g.reshape((-1,) + fake.shape[1:])
                pool, out_g = pool_query(pool, fake_g, prng)
                me = jax.lax.axis_index(data_axis)
                out = jax.lax.dynamic_slice_in_dim(
                    out_g, me * b_local, b_local, axis=0
                )
                return pool, out

            pools["fake_B"], fake_B_q = query(pools["fake_B"], fake_B, rng_pool_b)
            pools["fake_A"], fake_A_q = query(pools["fake_A"], fake_A, rng_pool_a)
        else:
            fake_B_q, fake_A_q = fake_B, fake_A

        # ---- D update (reference backward_D_basic, 0.5 weighting) ----
        def d_pair(D, dv, real, fake):
            """0.5 * (GAN(D(real), true) + GAN(D(fake), false)); one fused
            2B pass when the norm allows it."""
            real, fake = for_d(real), for_d(fake)
            if fuse_d:
                pred, dv = apply_net(
                    D, dv, jnp.concatenate([real, fake]), True, ctx=d_ctx
                )
                pr, pf = jnp.split(pred, 2)
            else:
                pr, dv = apply_net(D, dv, real, True, ctx=d_ctx)
                pf, dv = apply_net(D, dv, fake, True, ctx=d_ctx)
            loss = 0.5 * (
                losses.gan_loss(pr, True, gan_mode)
                + losses.gan_loss(pf, False, gan_mode)
            )
            return loss, dv

        def d_loss_fn(d_params):
            dva = {**nets["D_A"], "params": d_params["D_A"]}
            dvb = {**nets["D_B"], "params": d_params["D_B"]}
            loss_D_A, dva = d_pair(D_A, dva, real_B, fake_B_q)
            loss_D_B, dvb = d_pair(D_B, dvb, real_A, fake_A_q)
            return loss_D_A + loss_D_B, dict(
                D_A=loss_D_A, D_B=loss_D_B, dva=dva, dvb=dvb
            )

        d_params = {"D_A": nets["D_A"]["params"], "D_B": nets["D_B"]["params"]}
        (_, daux), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_params)
        d_grads = pmean_if(d_grads, axis_name)
        d_params_new, d_opt_new = apply_adam_update(
            d_params, d_grads, state.opts["D"], tx_d, lr
        )

        new_nets = {
            "G_A": {**gaux["gva"], "params": g_params_new["G_A"]},
            "G_B": {**gaux["gvb"], "params": g_params_new["G_B"]},
            "D_A": {**daux["dva"], "params": d_params_new["D_A"]},
            "D_B": {**daux["dvb"], "params": d_params_new["D_B"]},
        }
        for v in new_nets.values():
            if "batch_stats" in v:
                v["batch_stats"] = pmean_if(v["batch_stats"], axis_name)

        loss_dict = pmean_if(
            {
                "D_A": daux["D_A"], "G_A": gaux["G_A"], "cycle_A": gaux["cycle_A"],
                "idt_A": gaux["idt_A"], "D_B": daux["D_B"], "G_B": gaux["G_B"],
                "cycle_B": gaux["cycle_B"], "idt_B": gaux["idt_B"],
            },
            axis_name,
        )
        visuals = {
            "real_A": real_A, "fake_B": gaux["fake_B"], "rec_A": gaux["rec_A"],
            "real_B": real_B, "fake_A": gaux["fake_A"], "rec_B": gaux["rec_B"],
        }
        if debug_grads:
            visuals["_g_grads"] = g_grads
            visuals["_d_grads"] = d_grads
        new_state = state.replace(
            step=state.step + 1,
            nets=new_nets,
            opts={"G": g_opt_new, "D": d_opt_new},
            pools=pools,
        )
        return new_state, loss_dict, visuals

    return train_step


def make_eval_fn(cfg):
    gs, _ = build_nets(cfg)
    G_A, G_B = gs["G_A"], gs["G_B"]

    def eval_fn(state, batch, rng, train: bool = False, ctx=None):
        batch = prepare_batch(batch, rng, cfg, train=False)

        def fwd(G, v, x):
            y = G.apply(
                v, x, train, ctx,
                rngs={"dropout": rng} if train else None,
                mutable=["batch_stats"] if train and "batch_stats" in v else False,
            )
            return y[0] if isinstance(y, tuple) else y

        real_A, real_B = resolve_direction(batch, cfg.direction)
        fake_B = fwd(G_A, state.nets["G_A"], real_A)
        rec_A = fwd(G_B, state.nets["G_B"], fake_B)
        fake_A = fwd(G_B, state.nets["G_B"], real_B)
        rec_B = fwd(G_A, state.nets["G_A"], fake_A)
        return {
            "real_A": real_A, "fake_B": fake_B, "rec_A": rec_A,
            "real_B": real_B, "fake_A": fake_A, "rec_B": rec_B,
        }

    return eval_fn


@register_model("cycle_gan", CycleGANConfig)
class CycleGANModel(base.BaseModel):
    loss_names = ["D_A", "G_A", "cycle_A", "idt_A", "D_B", "G_B", "cycle_B", "idt_B"]
    visual_names = ["real_A", "fake_B", "rec_A", "real_B", "fake_A", "rec_B"]
    net_names = ["G_A", "G_B", "D_A", "D_B"]

    @staticmethod
    def config_defaults(train: bool) -> Dict[str, Any]:
        # reference CycleGANModel.modify_commandline_options
        d = {
            "norm": "instance",
            "netG": "resnet_9blocks",
            "no_dropout": True,
            "dataset_mode": "unaligned",
        }
        if train:
            d.update({"gan_mode": "lsgan", "pool_size": 50})
        return d

    def _create_state(self, rng):
        return create_state(self.cfg, rng)

    def _make_train_step(self, axis_name, ctx=None):
        return make_train_step(self.cfg, axis_name, ctx=ctx)

    def _make_eval_fn(self):
        return make_eval_fn(self.cfg)
