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

__all__ = [
    "zonal_power_spectrum",
    "radial_power_spectrum",
    "log_spectral_distance",
    "histogram_pdf",
    "pdf_distance",
    "rmse",
    "bias",
    "validation_metrics",
]
