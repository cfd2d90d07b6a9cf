"""End-to-end full-field inference over a climate HDF5 store (infer.py).

Covers the judged full-globe config path (BASELINE.json line 10) at toy
scale on the virtual CPU mesh: h5py ingestion -> per-variable stats ->
standardize -> spatially-sharded halo-exchanged generator forward ->
destandardize to physical units -> .npy field output. Also asserts the
sharded run equals the unsharded run (the halo exchange is exact).
"""

import os

import h5py
import numpy as np
import pytest

import infer
from biasgan_tpu.config import parse_config
from biasgan_tpu.models import create_model

H, W, T, NC = 24, 64, 3, 2


def _make_store(root):
    for side, seed in (("A", 0), ("B", 1)):
        d = os.path.join(root, "test" + side)
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(seed)
        with h5py.File(os.path.join(d, "data.h5"), "w") as f:
            f["t2m"] = rng.normal(280.0, 10.0, (T, H, W)).astype(np.float32)
            f["precip"] = rng.gamma(2.0, 1.0, (T, H, W)).astype(np.float32)


def _common_args(tmp_path):
    return [
        "--model", "pix2pix", "--dataset_mode", "climate",
        "--dataroot", str(tmp_path / "data"),
        "--checkpoints_dir", str(tmp_path / "ckpts"), "--name", "globe",
        "--netG", "resnet_3blocks", "--norm", "instance", "--no_dropout",
        "--input_nc", str(NC), "--output_nc", str(NC),
        "--ngf", "8", "--w_pad_mode", "wrap", "--netG_activation", "none",
        "--crop_size", "32",  # >= 32: the 3-layer PatchGAN D needs it at init
    ]


@pytest.fixture(scope="module")
def store(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("globe")
    _make_store(str(tmp_path / "data"))
    # fabricate a trained checkpoint: init a train-phase model, save 'latest'
    cfg = parse_config(
        _common_args(tmp_path) + ["--phase", "train", "--batch_size", "1"],
        train=True,
    )
    model = create_model(cfg)
    model.save_networks("latest")
    return tmp_path


def _run(store_path, mesh: int, tag: str) -> np.ndarray:
    out_dir = infer.main(
        _common_args(store_path)
        + [
            "--full_field", "--num_test", "2",
            "--spatial_mesh", str(mesh),
            "--results_dir", str(store_path / f"results_{tag}"),
        ]
    )
    files = sorted(os.listdir(out_dir))
    assert files == ["corrected_00000.npy", "corrected_00001.npy"]
    return np.load(os.path.join(out_dir, files[0]))


def test_full_globe_inference_sharded_equals_single(store):
    y1 = _run(store, 1, "m1")
    y2 = _run(store, 2, "m2")
    assert y1.shape == (1, H, W, NC)
    assert np.isfinite(y1).all()
    # halo-exchanged sharded forward is EXACT, not an overlap-tile approximation
    np.testing.assert_allclose(y1, y2, rtol=2e-4, atol=2e-4)


def test_output_is_in_physical_units(store):
    """A freshly-initialized G outputs near-zero standardized values; after
    destandardization with B-domain stats the t2m channel must sit near the
    B-domain mean (~280 K), proving standardize/destandardize are wired."""
    y = _run(store, 1, "units")
    t2m_mean = float(y[..., 1].mean())  # variables sorted: precip, t2m
    assert 200.0 < t2m_mean < 360.0, t2m_mean


def test_full_globe_inference_bf16_close_to_f32(store):
    """--compute_dtype bfloat16 (the judged fast path, BASELINE.md line-10
    bf16 row) must produce fields close to the f32 run in physical units:
    bf16 carries ~8 mantissa bits, so after destandardization (std ~10 K)
    per-pixel error should stay well under 1 K on a near-init G."""
    y_f32 = _run(store, 1, "units_f32")
    out_dir = infer.main(
        _common_args(store)
        + [
            "--full_field", "--num_test", "1",
            "--spatial_mesh", "1", "--compute_dtype", "bfloat16",
            "--results_dir", str(store / "results_bf16"),
        ]
    )
    y_bf16 = np.load(os.path.join(out_dir, "corrected_00000.npy"))
    assert y_bf16.dtype == np.float32  # outputs destandardize back to f32
    np.testing.assert_allclose(y_bf16, y_f32, rtol=2e-2, atol=1.0)


def test_full_globe_inference_fused_blocks(store, monkeypatch):
    """infer.py --fused_blocks: the staged (pre/blocks/post) dispatch with
    the Pallas fused-block kernels (interpret mode on CPU) produces the same
    corrected field as the plain single-jit XLA path."""
    # monkeypatch so the env infer.main sets is restored after the test
    monkeypatch.setenv("BIASGAN_FUSED_BLOCK", "interpret")
    monkeypatch.setenv("BIASGAN_FUSED_MIN_C", "1")  # toy ngf=8 -> C=32
    y_ref = _run(store, 1, "fused_ref")
    out_dir = infer.main(
        _common_args(store)
        + [
            "--full_field", "--num_test", "1",
            "--spatial_mesh", "1", "--fused_blocks",
            "--results_dir", str(store / "results_fused"),
        ]
    )
    y_fused = np.load(os.path.join(out_dir, "corrected_00000.npy"))
    np.testing.assert_allclose(y_fused, y_ref, rtol=2e-4, atol=2e-4)


def test_full_globe_inference_rdma_halo(store):
    """infer.py --halo_rdma: the Pallas RDMA ring transport produces the same
    corrected field as the ppermute transport (CPU interpreter mesh)."""
    y_pp = _run(store, 2, "m2b")
    out_dir = infer.main(
        _common_args(store)
        + [
            "--full_field", "--num_test", "1",
            "--spatial_mesh", "2", "--halo_rdma",
            "--results_dir", str(store / "results_rdma"),
        ]
    )
    import numpy as _np

    y_rdma = _np.load(os.path.join(out_dir, "corrected_00000.npy"))
    _np.testing.assert_allclose(y_rdma, y_pp, rtol=2e-5, atol=2e-5)
