"""In-graph spectral metrics for corrected-field validation.

Capability: the north star's "spectral ... parity" metrics
(BASELINE.json lines 5 and 11; SURVEY.md section 4 item 4). All pure jnp —
they jit into the validation step and run on-device.

TPU-native design note: the transforms are explicit **DFT matmuls** (cos/sin
matrices contracted on the MXU), NOT ``jnp.fft``. Two reasons:
  * matmuls are the native TPU primitive — a (H, H) x (N*W*C, H) DFT is a
    few GFLOPs even at 721x1440, noise for the MXU, and it shards/
    differentiates like any other contraction;
  * this environment's axon TPU backend hangs on XLA's FFT custom-call
    (verified: any jitted ``jnp.fft.rfft2`` dispatches but never completes),
    so an FFT-free formulation is also the only one that runs here.
The matrices are host-built numpy constants folded into the jitted graph;
results match ``numpy.fft`` to float tolerance (tests/unit/test_metrics.py).

Conventions: fields are NHWC; spectra are computed per channel and averaged
over the batch. The zonal spectrum (transform over the periodic longitude
axis) is the climatologically standard diagnostic; the radial spectrum is the
isotropic binning of the 2-D power.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@functools.lru_cache(maxsize=32)
def _rdft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Real-input DFT matrices: (n, n//2+1) cos and sin such that
    X_k = sum_j x_j (cos - i sin) — numpy rfft sign convention."""
    k = np.arange(n // 2 + 1)
    j = np.arange(n)[:, None]
    ang = 2.0 * np.pi * j * k[None, :] / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Full DFT matrices (n, n), same sign convention."""
    k = np.arange(n)
    j = np.arange(n)[:, None]
    ang = 2.0 * np.pi * j * k[None, :] / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _rfft_w(x: Array) -> Tuple[Array, Array]:
    """rfft along axis 2 of NHWC via matmul: returns (Re, Im) with shape
    (N, H, W//2+1, C)."""
    cw, sw = _rdft_mats(x.shape[2])
    re = jnp.einsum("nhwc,wk->nhkc", x, cw, preferred_element_type=jnp.float32)
    im = -jnp.einsum("nhwc,wk->nhkc", x, sw, preferred_element_type=jnp.float32)
    return re, im


def zonal_power_spectrum(x: Array) -> Array:
    """Mean power spectrum along the (periodic) W axis.

    x: (N, H, W, C) -> (W//2+1, C): power per zonal wavenumber, averaged over
    batch and latitude rows. f32 accumulation.
    """
    xf = x.astype(jnp.float32)
    re, im = _rfft_w(xf)
    power = (jnp.square(re) + jnp.square(im)) / x.shape[2]
    return jnp.mean(power, axis=(0, 1))


def _fft2_power(x: Array) -> Array:
    """|rfft2(x, axes=(1, 2))|^2 via two matmul DFT stages (W rfft, then full
    H fft of the complex intermediate). x: (N, H, W, C) f32 ->
    (N, H, W//2+1, C)."""
    re1, im1 = _rfft_w(x)
    ch, sh = _dft_mats(x.shape[1])
    # F_m = sum_h (re1 + i*im1)_h (cos - i sin)_mh
    re = jnp.einsum("nhkc,hm->nmkc", re1, ch, preferred_element_type=jnp.float32)
    re = re + jnp.einsum("nhkc,hm->nmkc", im1, sh, preferred_element_type=jnp.float32)
    im = jnp.einsum("nhkc,hm->nmkc", im1, ch, preferred_element_type=jnp.float32)
    im = im - jnp.einsum("nhkc,hm->nmkc", re1, sh, preferred_element_type=jnp.float32)
    return jnp.square(re) + jnp.square(im)


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
    power = _fft2_power(xf) / (h * w)  # (N, H, W//2+1, C)
    ky = np.fft.fftfreq(h)[:, None] * h
    kx = np.fft.rfftfreq(w)[None, :] * w
    scale = min(h, w) / max(h, w)
    if h <= w:
        k = np.sqrt(ky**2 + (kx * scale) ** 2)
    else:
        k = np.sqrt((ky * scale) ** 2 + kx**2)
    bin_idx = jnp.clip(jnp.asarray(k.astype(np.int32)), 0, n_bins - 1)
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
