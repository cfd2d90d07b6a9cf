"""Network factories — capability parity with the reference's
``define_G`` / ``define_D`` / ``init_net`` (models/networks.py, SURVEY.md
section 2.2 [K]).

The reference's init_net does three things: weight init, device placement and
DataParallel wrapping. Here weight init is baked into the modules
(init_type/init_gain attrs), device placement/sharding is the caller's
business (jit / shard_map over a Mesh — parallel/), so the factories return a
(module, params) pair from a pure functional init.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
from flax import linen as nn
from flax.core import FrozenDict

from biasgan_tpu.nn.discriminators import NLayerDiscriminator, PixelDiscriminator
from biasgan_tpu.nn.generators import ResNetGenerator, UNetGenerator

_UNET_DOWNS = {"unet_256": 8, "unet_128": 7, "unet_64": 6, "unet_32": 5}


def define_G(
    netG: str,
    output_nc: int,
    ngf: int = 64,
    norm: str = "batch",
    use_dropout: bool = False,
    init_type: str = "normal",
    init_gain: float = 0.02,
    w_mode: Optional[str] = None,
    compute_dtype: Any = None,
    out_activation: str = "tanh",
) -> nn.Module:
    """Build a generator module by name.

    Names (reference --netG values + TPU extensions):
      unet_256 | unet_128 | unet_64 | unet_32 — U-Net with 8/7/6/5 downs
      unet_d<K>                               — U-Net with K downs (e.g. the
                                                judged tiny config: unet_d4)
      resnet_9blocks | resnet_6blocks | resnet_<K>blocks
    ``w_mode`` overrides width-axis padding ('wrap' = periodic longitude).
    """
    common = dict(
        output_nc=output_nc,
        ngf=ngf,
        norm_type=norm,
        use_dropout=use_dropout,
        init_type=init_type,
        init_gain=init_gain,
        compute_dtype=compute_dtype,
        out_activation=out_activation,
    )
    m = re.fullmatch(r"unet_d(\d+)", netG)
    if netG in _UNET_DOWNS or m:
        downs = _UNET_DOWNS.get(netG) or int(m.group(1))
        return UNetGenerator(
            num_downs=downs, w_mode=w_mode or "zero", **common
        )
    m = re.fullmatch(r"resnet_(\d+)blocks", netG)
    if m:
        return ResNetGenerator(
            n_blocks=int(m.group(1)), w_mode=w_mode or "reflect", **common
        )
    raise ValueError(f"unknown generator name {netG!r}")


def define_D(
    netD: str,
    ndf: int = 64,
    n_layers_D: int = 3,
    norm: str = "batch",
    init_type: str = "normal",
    init_gain: float = 0.02,
    w_mode: str = "zero",
    compute_dtype: Any = None,
) -> nn.Module:
    """Build a discriminator by name: basic (3-layer PatchGAN) | n_layers |
    pixel — reference --netD values."""
    common = dict(
        ndf=ndf,
        norm_type=norm,
        init_type=init_type,
        init_gain=init_gain,
        compute_dtype=compute_dtype,
    )
    if netD == "basic":
        return NLayerDiscriminator(n_layers=3, w_mode=w_mode, **common)
    if netD == "n_layers":
        return NLayerDiscriminator(n_layers=n_layers_D, w_mode=w_mode, **common)
    if netD == "pixel":
        return PixelDiscriminator(**common)
    raise ValueError(f"unknown discriminator name {netD!r}")


def init_params(
    module: nn.Module,
    rng: jax.Array,
    sample_input: jax.Array,
    train: bool = False,
) -> FrozenDict:
    """Functional init; returns all variable collections (params +
    batch_stats when the module uses batch norm)."""
    params_rng, dropout_rng = jax.random.split(rng)
    return module.init(
        {"params": params_rng, "dropout": dropout_rng}, sample_input, train
    )


def count_params(variables) -> int:
    params = variables.get("params", variables) if hasattr(variables, "get") else variables
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
