"""pix2pix: paired image-to-image / bias-correction GAN.

Capability parity with the reference's ``Pix2PixModel``
(models/pix2pix_model.py, SURVEY.md sections 2.2 and 3.1 [K]):

  forward: fake_B = G(real_A)
  D step : 0.5 * (GAN(D(cat(A, sg(fake_B))), fake) + GAN(D(cat(A, B)), real))
  G step : GAN(D_updated(cat(A, fake_B)), real) + lambda_L1 * L1(fake_B, B)
  two Adam(beta1=0.5) optimizers, D updated before G (reference order);
  defaults --netG unet_256 --netD basic --norm batch --pool_size 0
  --gan_mode vanilla (modify_commandline_options).

TPU-native: the whole alternating update is ONE jitted function of a
``GANTrainState`` pytree. ``set_requires_grad`` is replaced by
differentiating w.r.t. exactly the right parameter subtree; the detached fake
is simply a concrete (non-traced) value in the D loss. When ``axis_name`` is
set the step runs under shard_map and pmeans grads/stats/losses across the
data-parallel mesh axis (SURVEY.md section 2.3).
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

Array = jax.Array


@dataclass
class Pix2PixConfig:
    lambda_L1: float = 100.0
    lambda_gp: float = 10.0  # only used when gan_mode == 'wgangp'


def build_nets(cfg):
    dtype = compute_dtype_of(cfg)
    G = define_G(
        cfg.netG,
        output_nc=cfg.output_nc,
        ngf=cfg.ngf,
        norm=cfg.norm,
        use_dropout=cfg.dropout(),
        init_type=cfg.init_type,
        init_gain=cfg.init_gain,
        w_mode=cfg.w_pad_mode or None,
        compute_dtype=dtype,
        out_activation=getattr(cfg, "netG_activation", "tanh"),
    )
    D = define_D(
        cfg.netD,
        ndf=cfg.ndf,
        n_layers_D=cfg.n_layers_D,
        norm=cfg.norm,
        init_type=cfg.init_type,
        init_gain=cfg.init_gain,
        w_mode=cfg.w_pad_mode or "zero",
        compute_dtype=dtype,
    )
    return G, D


def create_state(cfg, rng: Array) -> GANTrainState:
    """Train configs build G + D + both optimizers; test configs build G
    only — reference semantics (Pix2PixModel.__init__ defines D and the
    optimizers only under isTrain), which also lets test.py restore a
    checkpoint without knowing the training-time --ndf/--netD."""
    from biasgan_tpu.config import is_train_config

    G, D = build_nets(cfg)
    rng_g, rng_d = jax.random.split(rng)
    h = w = cfg.crop_size
    g_vars = init_params(G, rng_g, jnp.zeros((1, h, w, cfg.input_nc)), train=True)
    if not is_train_config(cfg):
        return init_state(nets={"G": dict(g_vars)}, opt_map={})
    # conditional D sees cat(A, B) on the channel axis
    d_vars = init_params(
        D, rng_d, jnp.zeros((1, h, w, cfg.input_nc + cfg.output_nc)), train=True
    )
    tx = adam_transform_of(cfg)
    return init_state(
        nets={"G": dict(g_vars), "D": dict(d_vars)},
        opt_map={"G": (tx, g_vars["params"]), "D": (tx, d_vars["params"])},
    )


def make_train_step(
    cfg,
    axis_name=None,
    debug_grad_norms: bool = False,
    ctx=None,
):
    """Build the pure jitted train step. See module docstring for semantics.

    ``axis_name``: mesh axis (or tuple of axes) to pmean grads/losses over —
    'data' for DP, 'spatial' for spatially-sharded training, or both.
    ``ctx``: a HaloCtx when the batch's W axis is sharded — every conv pads
    via halo exchange and instance norm pmeans its stats, so the step
    computes exactly the whole-field function (parallel/spatial.py)."""
    # Under spatial sharding (ctx): batch norm is supported — the G's norms
    # pmean their moments over the spatial axis (nn/layers.py Norm), and the
    # D runs on gathered full-W fields — so the judged default --norm batch
    # trains spatially, exactly equal to the whole-field step. wgangp is
    # likewise exact through the gathered-D path (the penalty's per-sample
    # norm sees full-W fields, identical on every spatial shard since the
    # rng is not spatial-folded); only the fully-sharded 'pixel' D would
    # compute a per-shard (wrong) penalty norm, so that combination stays
    # guarded.
    if ctx is not None and cfg.gan_mode == "wgangp" and cfg.netD == "pixel":
        raise NotImplementedError(
            "wgangp gradient penalty norms are W-global; unsupported with "
            "the fully-sharded 'pixel' D under spatial sharding (use a "
            "PatchGAN --netD, which runs on gathered fields)"
        )
    G, D = build_nets(cfg)
    tx_g = adam_transform_of(cfg)
    tx_d = adam_transform_of(cfg)
    lr_fn = make_lr_schedule(cfg)
    gan_mode = cfg.gan_mode
    lambda_l1 = cfg.lambda_L1
    lambda_gp = cfg.lambda_gp

    def train_step(
        state: GANTrainState, batch: Dict[str, Array], rng: Array
    ) -> Tuple[GANTrainState, Dict[str, Array], Dict[str, Array]]:
        # fold the rng per data shard (independent dropout/aug per replica);
        # spatial shards share one rng — they hold slices of the SAME fields
        names = () if axis_name is None else (
            (axis_name,) if isinstance(axis_name, str) else tuple(axis_name)
        )
        if "data" in names:
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        rng_drop, rng_gp = jax.random.split(rng)
        rng_aug = aug_key(rng)  # disjoint from the split streams (common.py)
        # under spatial sharding the W-flip/lon-roll aug is nonlocal; it is
        # applied GLOBALLY by spatial_train_step (outside the shard_map,
        # where GSPMD partitions it) — skip it here to avoid double-aug
        batch = prepare_batch(
            batch, rng_aug, cfg, train=True, skip_aug=ctx is not None
        )
        real_A, real_B = resolve_direction(batch, cfg.direction)
        g_vars, d_vars = state.nets["G"], state.nets["D"]
        drop_rngs = {"dropout": rng_drop}

        # ONE G forward per iteration (reference forward()), captured with
        # jax.vjp so the same linearization serves both the D step (which
        # sees fake_B as a constant — the reference's detach) and the G step
        # (pullback of dLoss/dfake_B through G). Saves a full G recompute.
        def g_forward(g_params):
            gv = {**g_vars, "params": g_params}
            fake, gv = apply_net(G, gv, real_A, True, drop_rngs, ctx)
            return fake, gv

        fake_B, g_vjp, gv_after = jax.vjp(g_forward, g_vars["params"], has_aux=True)

        # Under spatial sharding the G stays sharded (that's the memory win —
        # its stored-for-backward activations dominate), but a PatchGAN D
        # cannot: its final stride-1 4x4 convs shrink W by 1, which breaks
        # uniform sharding. Gather W for the D inputs instead — D compute is
        # replicated across spatial shards (D is the light net), its grads
        # come out identical per shard, and the fake-cotangent flows back
        # through all_gather's transpose (reduce_scatter) into the sharded G.
        # A 1x1 'pixel' D has no such convs and stays fully sharded.
        d_ctx = ctx
        gather_w = None
        if ctx is not None and cfg.netD != "pixel":
            d_ctx = None

            def gather_w(t):
                return jax.lax.all_gather(t, ctx.axis, axis=2, tiled=True)

        def for_d(t):
            return gather_w(t) if gather_w is not None else t

        real_AB = jnp.concatenate([for_d(real_A), for_d(real_B)], axis=-1)
        fake_d = for_d(fake_B)
        fake_AB = jnp.concatenate(
            [for_d(real_A), jax.lax.stop_gradient(fake_d)], axis=-1
        )

        # ---- D update (first, as in the reference). The fake and real
        # passes fuse into ONE 2B-batch pass when D has no batch norm
        # (exact for instance/none; batch norm computes per-pass batch
        # statistics, so fusing would change reference semantics). ----
        fuse_d = cfg.norm != "batch"

        def d_loss_fn(d_params):
            dv = {**d_vars, "params": d_params}
            if fuse_d:
                pred, dv = apply_net(
                    D, dv, jnp.concatenate([fake_AB, real_AB]), True, ctx=d_ctx
                )
                pred_fake, pred_real = jnp.split(pred, 2)
            else:
                pred_fake, dv = apply_net(D, dv, fake_AB, True, ctx=d_ctx)
                pred_real, dv = apply_net(D, dv, real_AB, True, ctx=d_ctx)
            loss_fake = losses.gan_loss(pred_fake, False, gan_mode)
            loss_real = losses.gan_loss(pred_real, True, gan_mode)
            loss = 0.5 * (loss_fake + loss_real)
            if gan_mode == "wgangp":
                def d_apply(x):
                    y, _ = apply_net(D, dv, x, True)
                    return y
                loss = loss + lambda_gp * losses.gradient_penalty(
                    d_apply, real_AB, fake_AB, rng_gp
                )
            return loss, (dv, loss_fake, loss_real)

        (_, (dv_after, loss_d_fake, loss_d_real)), d_grads = jax.value_and_grad(
            d_loss_fn, has_aux=True
        )(d_vars["params"])
        d_grads = pmean_if(d_grads, axis_name)
        lr = lr_fn(state.step, state.lr_scale)
        d_params_new, d_opt_new = apply_adam_update(
            d_vars["params"], d_grads, state.opts["D"], tx_d, lr
        )
        d_vars_new = {**dv_after, "params": d_params_new}

        # ---- G update (uses the freshly updated D, reference order): head
        # loss differentiated w.r.t. fake_B, then pulled back through the
        # saved G linearization ----
        def g_head_loss(fake):
            # gathered-D path: the cotangent returns through all_gather's
            # transpose (reduce_scatter), whose n-times factor exactly
            # cancels the spatial pmean on g_grads — global grad, exact
            fake_ab = jnp.concatenate([for_d(real_A), for_d(fake)], axis=-1)
            pred_fake, dv = apply_net(D, d_vars_new, fake_ab, True, ctx=d_ctx)
            loss_gan = losses.gan_loss(pred_fake, True, gan_mode)
            loss_l1 = losses.l1_loss(fake, real_B) * lambda_l1
            return loss_gan + loss_l1, (dv, loss_gan, loss_l1)

        (_, (dv_final, loss_g_gan, loss_g_l1)), fake_cot = jax.value_and_grad(
            g_head_loss, has_aux=True
        )(fake_B)
        (g_grads,) = g_vjp(fake_cot)
        fake_vis = fake_B
        g_grads = pmean_if(g_grads, axis_name)
        g_params_new, g_opt_new = apply_adam_update(
            g_vars["params"], g_grads, state.opts["G"], tx_g, lr
        )
        g_vars_final = {**gv_after, "params": g_params_new}
        d_vars_final = {**dv_final, "params": d_params_new}
        # keep replicated batch-norm running stats consistent across shards
        for v in (g_vars_final, d_vars_final):
            if "batch_stats" in v:
                v["batch_stats"] = pmean_if(v["batch_stats"], axis_name)

        scalars = {
            "G_GAN": loss_g_gan,
            "G_L1": loss_g_l1,
            "D_real": loss_d_real,
            "D_fake": loss_d_fake,
        }
        if debug_grad_norms:
            from biasgan_tpu.models.common import tree_l2

            # post-pmean: must be identical across DP configurations
            scalars["g_grad_norm"] = tree_l2(g_grads)
            scalars["d_grad_norm"] = tree_l2(d_grads)
        loss_dict = pmean_if(scalars, axis_name)
        new_state = state.replace(
            step=state.step + 1,
            nets={"G": g_vars_final, "D": d_vars_final},
            opts={"G": g_opt_new, "D": d_opt_new},
        )
        visuals = {"real_A": real_A, "fake_B": fake_vis, "real_B": real_B}
        return new_state, loss_dict, visuals

    return train_step


def make_eval_fn(cfg):
    """G-only forward (reference model.test()); train flag mirrors the
    reference's --eval semantics (dropout/BN stay in train mode unless eval)."""
    G, _ = build_nets(cfg)

    def eval_fn(state: GANTrainState, batch, rng, train: bool = False, ctx=None):
        batch = prepare_batch(batch, rng, cfg, train=False)
        real_A, real_B = resolve_direction(batch, cfg.direction)
        fake_B = G.apply(
            state.nets["G"],
            real_A,
            train,
            ctx,
            rngs={"dropout": rng} if train else None,
            mutable=["batch_stats"] if train and "batch_stats" in state.nets["G"] else False,
        )
        if isinstance(fake_B, tuple):
            fake_B = fake_B[0]
        return {"real_A": real_A, "fake_B": fake_B, "real_B": real_B}

    return eval_fn


@register_model("pix2pix", Pix2PixConfig)
class Pix2PixModel(base.BaseModel):
    """Reference-API wrapper (set_input / optimize_parameters / test /
    get_current_losses / save_networks) over the functional core above."""

    loss_names = ["G_GAN", "G_L1", "D_real", "D_fake"]
    visual_names = ["real_A", "fake_B", "real_B"]
    net_names = ["G", "D"]

    @staticmethod
    def config_defaults(train: bool) -> Dict[str, Any]:
        # reference Pix2PixModel.modify_commandline_options
        d = {"norm": "batch", "netG": "unet_256", "dataset_mode": "aligned"}
        if train:
            d.update({"pool_size": 0, "gan_mode": "vanilla"})
        return d

    def _create_state(self, rng):
        return create_state(self.cfg, rng)

    def _make_train_step(self, axis_name, ctx=None):
        return make_train_step(self.cfg, axis_name, ctx=ctx)

    def _make_eval_fn(self):
        return make_eval_fn(self.cfg)
