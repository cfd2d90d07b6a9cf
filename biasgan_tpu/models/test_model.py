"""TestModel: generator-only wrapper for one-direction inference.

Capability parity with the reference's ``TestModel`` (models/test_model.py,
SURVEY.md section 2.2 [K]): loads a trained G and applies it to single-sided
data. Also the vehicle for spatially-sharded full-globe inference: pass
``--spatial_mesh N`` and the forward runs halo-sharded over the mesh
(parallel/spatial.py) in one jitted call.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict

import jax.numpy as jnp

from biasgan_tpu.models import base
from biasgan_tpu.models.common import (
    GANTrainState,
    adam_transform,
    compute_dtype_of,
    init_state,
)
from biasgan_tpu.nn import define_G, init_params
from biasgan_tpu.registry import register_model


@dataclass
class TestModelConfig:
    model_suffix: str = ""  # reference: load "G<suffix>" (e.g. '_A' from CycleGAN)


@register_model("test", TestModelConfig)
class TestModel(base.BaseModel):
    loss_names: list = []
    visual_names = ["real", "fake"]
    net_names = ["G"]

    @staticmethod
    def config_defaults(train: bool) -> Dict[str, Any]:
        if train:
            raise ValueError("TestModel is test-time only (reference semantics)")
        return {"dataset_mode": "single"}

    def _create_state(self, rng) -> GANTrainState:
        cfg = self.cfg
        G = self._build_g()
        g_vars = init_params(
            G, rng, jnp.zeros((1, cfg.crop_size, cfg.crop_size, cfg.input_nc))
        )
        tx = adam_transform()
        return init_state(
            nets={"G": dict(g_vars)}, opt_map={"G": (tx, g_vars["params"])}
        )

    def _build_g(self):
        cfg = self.cfg
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
        )

    def _make_train_step(self, axis_name, ctx=None):
        raise NotImplementedError("TestModel does not train")

    def load_networks(self, tag):
        """Reference semantics: with --model_suffix '_A', load net 'G_A' from
        a differently-structured checkpoint (e.g. CycleGAN's 4-net state)
        into this model's single 'G' slot."""
        if not self.cfg.model_suffix:
            return super().load_networks(tag)
        from biasgan_tpu.utils import checkpoint as ckpt

        raw = ckpt.restore_raw(self.run_dir, str(tag))
        gname = "G" + self.cfg.model_suffix
        nets = raw["nets"] if isinstance(raw, dict) else raw.nets
        if gname not in nets:
            raise KeyError(
                f"checkpoint has nets {sorted(nets)}; no {gname!r} "
                "(--model_suffix must name one of them)"
            )
        self.state = self.state.replace(nets={"G": dict(nets[gname])})

    def _make_eval_fn(self):
        G = self._build_g()

        def eval_fn(state, batch, rng, train: bool = False, ctx=None):
            real = batch["A"]
            fake = G.apply(
                state.nets["G"],
                real,
                train,
                ctx,
                rngs={"dropout": rng} if train else None,
                mutable=["batch_stats"]
                if train and "batch_stats" in state.nets["G"]
                else False,
            )
            if isinstance(fake, tuple):
                fake = fake[0]
            return {"real": real, "fake": fake}

        return eval_fn
