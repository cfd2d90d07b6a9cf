"""Network zoo: generators, discriminators, norm layers, weight init.

Rebuilds the capability of the reference's ``models/networks.py``
(SURVEY.md section 2.2, "Network zoo" row) with TPU-native choices:
NHWC layout, f32 params with optional bf16 compute, explicit torch-semantics
ConvTranspose (for the parity oracle), and every spatial op pluggable into a
halo-exchange spatial-sharding context (parallel/spatial.py).
"""

from biasgan_tpu.nn.layers import (
    Conv2d,
    ConvTranspose2d,
    Norm,
    instance_norm,
    pad_hw,
)
from biasgan_tpu.nn.generators import UNetGenerator, ResNetGenerator
from biasgan_tpu.nn.discriminators import NLayerDiscriminator, PixelDiscriminator
from biasgan_tpu.nn.factory import define_G, define_D, init_params, count_params

__all__ = [
    "Conv2d",
    "ConvTranspose2d",
    "Norm",
    "instance_norm",
    "pad_hw",
    "UNetGenerator",
    "ResNetGenerator",
    "NLayerDiscriminator",
    "PixelDiscriminator",
    "define_G",
    "define_D",
    "init_params",
    "count_params",
]
