"""In-graph spectral metrics for corrected-field validation.

Capability: the north star's "spectral ... parity" metrics
(BASELINE.json lines 5 and 11; SURVEY.md section 4 item 4). All pure jnp — they jit
into the validation step and run on-device (the FFT lowers to XLA's TPU FFT).

Conventions: fields are NHWC; spectra are computed per channel and averaged
over the batch. The zonal spectrum (FFT over the periodic longitude axis) is
the climatologically standard diagnostic; the radial spectrum is the
isotropic binning of the 2-D power.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

Array = jax.Array


def zonal_power_spectrum(x: Array) -> Array:
    """Mean power spectrum along the (periodic) W axis.

    x: (N, H, W, C) -> (W//2+1, C): power per zonal wavenumber, averaged over
    batch and latitude rows. f32 accumulation.
    """
    xf = x.astype(jnp.float32)
    spec = jnp.fft.rfft(xf, axis=2)
    power = jnp.square(jnp.abs(spec)) / x.shape[2]
    return jnp.mean(power, axis=(0, 1))


def radial_power_spectrum(x: Array, n_bins: int = 0) -> Array:
    """Isotropic (radially binned) 2-D power spectrum.

    x: (N, H, W, C) -> (n_bins, C). Bin k collects |k| in [k, k+1) in units of
    the smaller dimension's fundamental frequency. Static shapes; the binning
    is a one-hot matmul (MXU-friendly, no scatter).
    """
    n, h, w, c = x.shape
    if n_bins == 0:
        n_bins = min(h, w) // 2
    xf = x.astype(jnp.float32)
    spec = jnp.fft.rfft2(xf, axes=(1, 2))
    power = jnp.square(jnp.abs(spec)) / (h * w)  # (N, H, W//2+1, C)
    ky = jnp.fft.fftfreq(h)[:, None] * h
    kx = jnp.fft.rfftfreq(w)[None, :] * w
    scale = min(h, w) / max(h, w)
    if h <= w:
        k = jnp.sqrt(ky**2 + (kx * scale) ** 2)
    else:
        k = jnp.sqrt((ky * scale) ** 2 + kx**2)
    bin_idx = jnp.clip(k.astype(jnp.int32), 0, n_bins - 1)  # (H, W//2+1)
    one_hot = jax.nn.one_hot(bin_idx, n_bins, dtype=jnp.float32)  # (H, Wr, B)
    counts = jnp.sum(one_hot, axis=(0, 1))  # (B,)
    binned = jnp.einsum("nhwc,hwb->bc", power, one_hot)
    return binned / jnp.maximum(counts, 1.0)[:, None] / n


def log_spectral_distance(a: Array, b: Array, eps: float = 1e-12) -> Array:
    """RMS difference of log radial power spectra — scalar 'spectral parity'
    figure (lower is better)."""
    pa = radial_power_spectrum(a)
    pb = radial_power_spectrum(b)
    d = jnp.log10(pa + eps) - jnp.log10(pb + eps)
    return jnp.sqrt(jnp.mean(jnp.square(d)))
