"""Unit tests: in-graph spectral/PDF metrics (SURVEY.md section 4 item 4)."""

import jax
import jax.numpy as jnp
import numpy as np

from biasgan_tpu.ops import (
    histogram_pdf,
    log_spectral_distance,
    pdf_distance,
    radial_power_spectrum,
    rmse,
    zonal_power_spectrum,
)


def test_zonal_spectrum_peak_at_wavenumber():
    w = 64
    x = jnp.sin(2 * jnp.pi * 5 * jnp.arange(w) / w)  # zonal wavenumber 5
    field = jnp.broadcast_to(x, (2, 8, w))[..., None]
    spec = zonal_power_spectrum(field)
    assert int(jnp.argmax(spec[:, 0])) == 5


def test_radial_spectrum_identity_distance_zero():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 2))
    assert float(log_spectral_distance(x, x)) == 0.0
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 2)) * 3.0
    assert float(log_spectral_distance(x, y)) > 0.1


def test_radial_spectrum_parseval():
    """Sum of radially binned power * counts ~ total power (sanity)."""
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 1))
    spec = radial_power_spectrum(x, n_bins=16)
    assert spec.shape == (16, 1)
    assert bool(jnp.all(spec >= 0))


def test_histogram_pdf_normalized():
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3), minval=-1, maxval=1)
    pdf = histogram_pdf(x, -1, 1, 32)
    np.testing.assert_allclose(np.asarray(pdf.sum(axis=0)), 1.0, rtol=1e-5)


def test_pdf_distance_bounds():
    x = jnp.full((1, 8, 8, 1), -0.9)
    y = jnp.full((1, 8, 8, 1), 0.9)
    assert float(pdf_distance(x, x)) == 0.0
    np.testing.assert_allclose(float(pdf_distance(x, y)), 1.0, rtol=1e-6)


def test_rmse():
    a = jnp.zeros((1, 4, 4, 1))
    b = jnp.full((1, 4, 4, 1), 2.0)
    np.testing.assert_allclose(float(rmse(a, b)), 2.0, rtol=1e-6)


def test_metrics_jit_compatible():
    from biasgan_tpu.ops import validation_metrics

    f = jax.jit(validation_metrics)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 1))
    out = f(x, x * 1.01)
    assert set(out) == {"rmse", "bias", "pdf_tv", "log_spectral_distance"}
    assert all(np.isfinite(float(v)) for v in out.values())


def test_histogram_chunked_equals_direct(monkeypatch):
    """The scan-chunked accumulation path (used for full-globe fields, where
    a one-shot comparison mask would be GBs) must equal the direct path,
    including a ragged tail chunk."""
    import jax
    from biasgan_tpu.ops import metrics as M

    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 37, 29, 2), minval=-1.2, maxval=1.2)
    direct = np.asarray(M.histogram_pdf(x))
    monkeypatch.setattr(M, "_HIST_CHUNK", 256)  # 37*29=1073 px -> 4 chunks + tail
    chunked = np.asarray(jax.jit(M.histogram_pdf)(x))
    np.testing.assert_allclose(chunked, direct, rtol=1e-6, atol=1e-7)
    assert chunked.shape == (64, 2)
    np.testing.assert_allclose(chunked.sum(axis=0), 1.0, rtol=1e-6)
