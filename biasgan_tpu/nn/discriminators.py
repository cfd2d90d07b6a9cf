"""Discriminator zoo: PatchGAN (NLayer) and 1x1 Pixel discriminators.

Capability parity: ``NLayerDiscriminator`` / ``PixelDiscriminator`` of the
reference's ``models/networks.py`` (SURVEY.md section 2.2 [K]). 'basic' = 3-layer
70x70 PatchGAN. Outputs a raw (unsigmoided) per-patch logit map; the GAN loss
applies the right criterion (losses.py), as in the reference's GANLoss.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
from flax import linen as nn

from biasgan_tpu.nn.layers import (
    Conv2d,
    Norm,
    SpatialCtx,
    norm_act,
    norm_uses_bias,
)

Array = jax.Array


def _lrelu(x: Array) -> Array:
    return nn.leaky_relu(x, negative_slope=0.2)


class NLayerDiscriminator(nn.Module):
    """PatchGAN: 4x4 stride-2 conv stack, norm from layer 2, LeakyReLU(0.2),
    final 1-channel logit map. n_layers=3 is the reference's 'basic' D."""

    ndf: int = 64
    n_layers: int = 3
    norm_type: str = "batch"
    w_mode: str = "zero"
    init_type: str = "normal"
    init_gain: float = 0.02
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, ctx: Optional[SpatialCtx] = None
    ) -> Array:
        use_bias = norm_uses_bias(self.norm_type)
        common = dict(
            w_mode=self.w_mode,
            init_type=self.init_type,
            init_gain=self.init_gain,
            compute_dtype=self.compute_dtype,
        )
        h = Conv2d(
            self.ndf, (4, 4), strides=(2, 2), padding=(1, 1), use_bias=True,
            name="conv0", **common,
        )(x, ctx)
        h = _lrelu(h)
        nf = 1
        for n in range(1, self.n_layers):
            nf = min(2**n, 8)
            h = Conv2d(
                self.ndf * nf, (4, 4), strides=(2, 2), padding=(1, 1),
                use_bias=use_bias, name=f"conv{n}", **common,
            )(h, ctx)
            h = norm_act(
                h, self.norm_type, f"norm{n}", train, ctx, activation="lrelu",
                dtype=self.compute_dtype,
            )
        nf = min(2**self.n_layers, 8)
        h = Conv2d(
            self.ndf * nf, (4, 4), strides=(1, 1), padding=(1, 1),
            use_bias=use_bias, name=f"conv{self.n_layers}", **common,
        )(h, ctx)
        h = norm_act(
            h, self.norm_type, f"norm{self.n_layers}", train, ctx, activation="lrelu",
            dtype=self.compute_dtype,
        )
        return Conv2d(
            1, (4, 4), strides=(1, 1), padding=(1, 1), use_bias=True,
            name="conv_out", **common,
        )(h, ctx)


class PixelDiscriminator(nn.Module):
    """1x1-conv discriminator: classifies each pixel independently."""

    ndf: int = 64
    norm_type: str = "batch"
    init_type: str = "normal"
    init_gain: float = 0.02
    compute_dtype: Any = None

    @nn.compact
    def __call__(
        self, x: Array, train: bool = False, ctx: Optional[SpatialCtx] = None
    ) -> Array:
        use_bias = norm_uses_bias(self.norm_type)
        common = dict(
            init_type=self.init_type,
            init_gain=self.init_gain,
            compute_dtype=self.compute_dtype,
        )
        h = Conv2d(self.ndf, (1, 1), use_bias=True, name="conv0", **common)(x, ctx)
        h = _lrelu(h)
        h = Conv2d(self.ndf * 2, (1, 1), use_bias=use_bias, name="conv1", **common)(
            h, ctx
        )
        h = norm_act(h, self.norm_type, "norm1", train, ctx, activation="lrelu", dtype=self.compute_dtype)
        return Conv2d(1, (1, 1), use_bias=use_bias, name="conv_out", **common)(h, ctx)
