#!/usr/bin/env python
"""Inference / bias-correction driver — reference test.py semantics
(SURVEY.md section 3.3 [K]): load a trained G, run model.test() over the
dataset, write result images/fields + an HTML index page.

For full-globe spatially-sharded inference over a device mesh, use infer.py
(one jitted halo-exchanged call, BASELINE.json line 10).
"""

from __future__ import annotations

import os
import sys

from biasgan_tpu import enable_compile_cache, respect_platform_env

respect_platform_env()
enable_compile_cache()
from biasgan_tpu.config import format_config, parse_config, save_config
from biasgan_tpu.data import create_dataset
from biasgan_tpu.models import create_model
from biasgan_tpu.utils import html as html_mod
from biasgan_tpu.utils.visualizer import save_images


def main(argv=None):
    cfg = parse_config(argv, train=False)
    print(format_config(cfg))
    save_config(cfg)
    # fail fast on a missing checkpoint — before paying for model build/compile
    from biasgan_tpu.utils.checkpoint import has_checkpoint

    tag = f"iter_{cfg.load_iter}" if cfg.load_iter > 0 else cfg.epoch
    if not has_checkpoint(cfg.run_dir(), tag):
        raise SystemExit(
            f"no checkpoint '{tag}' under {cfg.run_dir()}/ckpt — train first or "
            "check --name/--checkpoints_dir/--epoch"
        )
    dataset = create_dataset(cfg)
    model = create_model(cfg)
    model.setup()
    if cfg.eval:
        model.eval()

    web_dir = os.path.join(cfg.results_dir, cfg.resolved_name(), f"{cfg.phase}_{cfg.epoch}")
    print(f"creating web directory {web_dir}")
    webpage = html_mod.HTML(
        web_dir, f"Experiment = {cfg.name}, Phase = {cfg.phase}, Epoch = {cfg.epoch}"
    )
    for i, data in enumerate(dataset):
        if cfg.num_test and i >= cfg.num_test:
            break
        model.set_input(data)
        model.test()
        visuals = model.get_current_visuals()
        img_path = model.get_image_paths()
        if i % 5 == 0:
            print(f"processing ({i:04d})-th image... {img_path}")
        save_images(webpage, visuals, img_path, aspect_ratio=cfg.aspect_ratio)
    webpage.save()
    return web_dir


if __name__ == "__main__":
    main(sys.argv[1:])
