"""Observability layer (utils/visualizer.py, utils/html.py, utils/imaging.py):
loss-log line format (reference parity), HTML page generation, image
round-trip, and tensor2im range mapping."""

import os

import numpy as np

from biasgan_tpu.config import parse_config
from biasgan_tpu.utils import html as html_mod
from biasgan_tpu.utils.imaging import save_image, tensor2im
from biasgan_tpu.utils.visualizer import Visualizer, save_images


def _cfg(tmp):
    return parse_config(
        [
            "--model", "pix2pix", "--dataset_mode", "synthetic",
            "--checkpoints_dir", str(tmp), "--name", "viz",
        ],
        train=True,
    )


def test_tensor2im_range():
    x = np.array([[[[-1.0], [0.0]], [[1.0], [0.5]]]], np.float32)  # NHWC
    img = tensor2im(x)
    assert img.dtype == np.uint8
    assert img[0, 0, 0] == 0 and img[1, 0, 0] == 255  # [-1,1] -> [0,255]
    assert img.shape == (2, 2, 3)  # grayscale tiled to RGB


def test_loss_log_format_and_tb(tmp_path):
    cfg = _cfg(tmp_path)
    cfg.steps_per_epoch = 4
    viz = Visualizer(cfg)
    viz.print_current_losses(2, 16, {"G_L1": 1.5, "D_real": 0.25}, 0.01, 0.002)
    log = open(os.path.join(cfg.run_dir(), "loss_log.txt")).read()
    # reference format: (epoch: E, iters: I, time: T, data: D) name: value
    assert "(epoch: 2, iters: 16, time: 0.010, data: 0.002) G_L1: 1.500 D_real: 0.250" in log


def test_display_and_html(tmp_path):
    cfg = _cfg(tmp_path)
    viz = Visualizer(cfg)
    vis = {
        "real_A": np.zeros((1, 8, 8, 1), np.float32),
        "fake_B": np.ones((1, 8, 8, 1), np.float32),
    }
    viz.display_current_results(vis, epoch=1)
    web = os.path.join(cfg.run_dir(), "web")
    assert os.path.exists(os.path.join(web, "images", "epoch001_real_A.png"))
    assert os.path.exists(os.path.join(web, "index.html"))
    content = open(os.path.join(web, "index.html")).read()
    assert "epoch001_fake_B.png" in content


def test_save_images_result_page(tmp_path):
    page = html_mod.HTML(str(tmp_path / "res"), "t")
    vis = {"fake_B": np.zeros((1, 8, 8, 3), np.float32)}
    save_images(page, vis, ["/data/sample_042.h5#t3"])
    page.save()
    imgdir = page.get_image_dir()
    files = os.listdir(imgdir)
    assert any(f.endswith("_fake_B.png") for f in files)
    idx = open(str(tmp_path / "res" / "index.html")).read()
    assert "fake_B" in idx


def test_save_image_aspect_ratio(tmp_path):
    from PIL import Image

    img = (np.random.default_rng(0).random((8, 8, 3)) * 255).astype(np.uint8)
    p = str(tmp_path / "a.png")
    save_image(img, p, aspect_ratio=2.0)
    assert Image.open(p).size in ((16, 8), (8, 16))
