"""Template model — the documented extension example (capability parity with
the reference family's ``models/template_model.py``, which exists purely to
show users how to add a model; SURVEY.md section 3.4 registry mechanism).

It implements the simplest useful model: a generator trained with plain L1
regression (no discriminator) — handy as a deterministic baseline for the
bias-correction GANs. To add your own model:

1. subclass ``base.BaseModel``; declare loss_names / visual_names / net_names;
2. write a dataclass of extra config fields (they become CLI flags);
3. implement the three factory hooks returning PURE functions over a
   ``GANTrainState`` pytree (the jitted core);
4. decorate with ``@register_model("yourname", YourConfig)`` and import the
   module from ``models/__init__.py``.

Run:  python train.py --model template --dataset_mode synthetic \
          --netG unet_d4 --crop_size 64 --input_nc 1 --output_nc 1
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
    adam_transform,
    apply_adam_update,
    apply_net,
    compute_dtype_of,
    init_state,
    make_lr_schedule,
    pmean_if,
    prepare_batch,
    resolve_direction,
)
from biasgan_tpu.nn import define_G, init_params
from biasgan_tpu.registry import register_model

Array = jax.Array


@dataclass
class TemplateConfig:
    lambda_regression: float = 1.0  # weight of the L1 regression loss


def _build_g(cfg):
    return define_G(
        cfg.netG,
        output_nc=cfg.output_nc,
        ngf=cfg.ngf,
        norm=cfg.norm,
        use_dropout=cfg.dropout(),
        init_type=cfg.init_type,
        init_gain=cfg.init_gain,
        w_mode=cfg.w_pad_mode or None,
        compute_dtype=compute_dtype_of(cfg),
        out_activation=getattr(cfg, "netG_activation", "tanh"),
    )


def create_state(cfg, rng: Array) -> GANTrainState:
    G = _build_g(cfg)
    h = w = cfg.crop_size
    g_vars = init_params(G, rng, jnp.zeros((1, h, w, cfg.input_nc)), train=True)
    tx = adam_transform(getattr(cfg, "beta1", 0.5))
    return init_state(
        nets={"G": dict(g_vars)}, opt_map={"G": (tx, g_vars["params"])}
    )


def make_train_step(cfg, axis_name: Optional[str] = None):
    G = _build_g(cfg)
    tx = adam_transform(cfg.beta1)
    lr_fn = make_lr_schedule(cfg)
    lam = cfg.lambda_regression

    def train_step(
        state: GANTrainState, batch: Dict[str, Array], rng: Array
    ) -> Tuple[GANTrainState, Dict[str, Array], Dict[str, Array]]:
        if axis_name is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        rng_drop, rng_aug = jax.random.split(rng)
        batch = prepare_batch(batch, rng_aug, cfg, train=True)
        real_A, real_B = resolve_direction(batch, cfg.direction)
        g_vars = state.nets["G"]

        def loss_fn(params):
            gv = {**g_vars, "params": params}
            fake_B, gv = apply_net(G, gv, real_A, True, {"dropout": rng_drop})
            return lam * losses.l1_loss(fake_B, real_B), (gv, fake_B)

        (loss, (gv_after, fake_B)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(g_vars["params"])
        grads = pmean_if(grads, axis_name)
        lr = lr_fn(state.step, state.lr_scale)
        params_new, opt_new = apply_adam_update(
            g_vars["params"], grads, state.opts["G"], tx, lr
        )
        gv_final = {**gv_after, "params": params_new}
        if "batch_stats" in gv_final:
            gv_final["batch_stats"] = pmean_if(gv_final["batch_stats"], axis_name)
        loss_dict = pmean_if({"G_L1": loss}, axis_name)
        new_state = state.replace(
            step=state.step + 1, nets={"G": gv_final}, opts={"G": opt_new}
        )
        visuals = {"real_A": real_A, "fake_B": fake_B, "real_B": real_B}
        return new_state, loss_dict, visuals

    return train_step


def make_eval_fn(cfg):
    G = _build_g(cfg)

    def eval_fn(state, batch, rng, train: bool = False, ctx=None):
        batch = prepare_batch(batch, rng, cfg, train=False)
        real_A, real_B = resolve_direction(batch, cfg.direction)
        out = G.apply(
            state.nets["G"], real_A, train, ctx,
            rngs={"dropout": rng} if train else None,
            mutable=["batch_stats"]
            if train and "batch_stats" in state.nets["G"]
            else False,
        )
        fake_B = out[0] if isinstance(out, tuple) else out
        return {"real_A": real_A, "fake_B": fake_B, "real_B": real_B}

    return eval_fn


@register_model("template", TemplateConfig)
class TemplateModel(base.BaseModel):
    loss_names = ["G_L1"]
    visual_names = ["real_A", "fake_B", "real_B"]
    net_names = ["G"]

    @staticmethod
    def config_defaults(train: bool) -> Dict[str, Any]:
        return {"dataset_mode": "aligned", "netG": "unet_256"}

    def _create_state(self, rng):
        return create_state(self.cfg, rng)

    def _make_train_step(self, axis_name, ctx=None):
        if ctx is not None:
            raise NotImplementedError("spatial training: see pix2pix")
        return make_train_step(self.cfg, axis_name)

    def _make_eval_fn(self):
        return make_eval_fn(self.cfg)
