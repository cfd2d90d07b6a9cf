"""ops: in-graph validation metrics + Pallas TPU kernels."""

from biasgan_tpu.ops.spectral import (
    zonal_power_spectrum,
    radial_power_spectrum,
    log_spectral_distance,
)
from biasgan_tpu.ops.metrics import (
    histogram_pdf,
    pdf_distance,
    rmse,
    bias,
    validation_metrics,
)
from biasgan_tpu.ops.pallas_fused import fused_instance_norm_act
from biasgan_tpu.ops.pallas_halo import halo_exchange_w

__all__ = [
    "fused_instance_norm_act",
    "halo_exchange_w",
    "zonal_power_spectrum",
    "radial_power_spectrum",
    "log_spectral_distance",
    "histogram_pdf",
    "pdf_distance",
    "rmse",
    "bias",
    "validation_metrics",
]
