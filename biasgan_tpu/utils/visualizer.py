"""Training observability (reference util/visualizer.py [K], SURVEY.md
section 5 metrics row): loss_log.txt lines in the reference's format,
TensorBoard scalars + image summaries (visdom is not in this environment;
TensorBoard is the TPU-stack-native choice), and HTML snapshot pages of
current visuals.
"""

from __future__ import annotations

import os
import re
import time
from typing import Dict

import numpy as np

from biasgan_tpu.utils import html as html_mod
from biasgan_tpu.utils.imaging import save_image, tensor2im

_EPOCH_RE = re.compile(r"epoch(\d+)_")


class Visualizer:
    def __init__(self, cfg):
        self.cfg = cfg
        self.run_dir = cfg.run_dir()
        os.makedirs(self.run_dir, exist_ok=True)
        self.log_name = os.path.join(self.run_dir, "loss_log.txt")
        with open(self.log_name, "a") as f:
            f.write(f"================ Training Loss ({time.strftime('%c')}) ================\n")
        self.web_dir = os.path.join(self.run_dir, "web")
        os.makedirs(os.path.join(self.web_dir, "images"), exist_ok=True)
        self._page_rows = None  # epoch -> rendered row html (lazy disk seed)
        self._tb = None
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(os.path.join(self.run_dir, "tb"))
        except Exception:
            pass

    def print_current_losses(
        self, epoch: int, iters: int, losses: Dict[str, float],
        t_comp: float, t_data: float,
    ):
        """Reference format: (epoch: E, iters: I, time: T, data: D) name: v

        T (t_comp) is per-sample enqueue+sync time measured at print points
        only; with async dispatch it is NOT the step's compute time between
        prints (see the train.py note). Don't bench off this line."""
        msg = f"(epoch: {epoch}, iters: {iters}, time: {t_comp:.3f}, data: {t_data:.3f}) "
        msg += " ".join(f"{k}: {v:.3f}" for k, v in losses.items())
        print(msg)
        with open(self.log_name, "a") as f:
            f.write(msg + "\n")
        if self._tb is not None:
            step = (epoch - 1) * max(self.cfg.steps_per_epoch, 1) + iters
            for k, v in losses.items():
                self._tb.add_scalar(f"loss/{k}", v, step)

    def display_current_results(self, visuals: Dict[str, np.ndarray], epoch: int):
        for label, image in visuals.items():
            img = tensor2im(image)
            save_image(
                img, os.path.join(self.web_dir, "images", f"epoch{epoch:03d}_{label}.png")
            )
            if self._tb is not None:
                self._tb.add_image(f"visual/{label}", img, epoch, dataformats="HWC")
        # incremental page build: per-epoch rows are rendered once and cached
        # (one disk scan on resume), so each call costs O(1) row work instead
        # of re-scanning and re-rendering every prior epoch
        if self._page_rows is None:
            self._page_rows = self._scan_existing_rows(list(visuals))
        self._page_rows[epoch] = self._render_row(epoch, list(visuals))
        page = html_mod.HTML(self.web_dir, f"Experiment = {self.cfg.name}")
        for e in sorted(self._page_rows, reverse=True):
            page.rows.append(self._page_rows[e])
        page.save()

    def _render_row(self, epoch: int, labels) -> str:
        page = html_mod.HTML(self.web_dir, "")
        page.add_header(f"epoch [{epoch}]")
        ims = [f"epoch{epoch:03d}_{lab}.png" for lab in labels]
        page.add_images(ims, labels, ims)
        return "\n".join(page.rows)

    def _scan_existing_rows(self, labels) -> Dict[int, str]:
        """One-time seed of the row cache from images already on disk
        (--continue_train resumes keep their history)."""
        rows: Dict[int, str] = {}
        img_dir = os.path.join(self.web_dir, "images")
        first = labels[0] if labels else None
        for fname in os.listdir(img_dir):
            if first and fname.startswith("epoch") and fname.endswith(f"_{first}.png"):
                m = _EPOCH_RE.match(fname)
                if not m:
                    continue
                e = int(m.group(1))
                rows[e] = self._render_row(e, labels)
        return rows

    def plot_current_metrics(self, step: int, metrics: Dict[str, float], prefix="val"):
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(f"{prefix}/{k}", v, step)


def save_images(webpage, visuals, image_path, aspect_ratio=1.0, width=256):
    """Reference util.visualizer.save_images: write result images of one
    sample + add an HTML row."""
    image_dir = webpage.get_image_dir()
    short_path = os.path.basename(image_path[0] if isinstance(image_path, list) else image_path)
    name = os.path.splitext(short_path)[0].replace("/", "_").replace(":", "_")
    webpage.add_header(name)
    ims, txts, links = [], [], []
    for label, im_data in visuals.items():
        im = tensor2im(im_data)
        image_name = f"{name}_{label}.png"
        save_image(im, os.path.join(image_dir, image_name), aspect_ratio=aspect_ratio)
        ims.append(image_name)
        txts.append(label)
        links.append(image_name)
    webpage.add_images(ims, txts, links, width=width)
