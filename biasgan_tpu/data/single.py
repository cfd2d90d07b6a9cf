"""Single-sided dataset: A only, for test-time generator application
(reference data/single_dataset.py [K])."""

from __future__ import annotations

from typing import Dict

from biasgan_tpu.data.image_folder import make_dataset
from biasgan_tpu.data.transforms import sample_rng, transform_image
from biasgan_tpu.registry import register_dataset


@register_dataset("single")
class SingleDataset:
    def __init__(self, cfg):
        self.cfg = cfg
        self.A_paths = make_dataset(cfg.dataroot, cfg.max_dataset_size)
        self.input_nc = cfg.output_nc if cfg.direction == "BtoA" else cfg.input_nc

    def __len__(self) -> int:
        return len(self.A_paths)

    def __getitem__(self, index: int) -> Dict:
        from PIL import Image

        path = self.A_paths[index]
        rng = sample_rng(self.cfg.seed, getattr(self, "epoch", 0), index)
        a = transform_image(
            Image.open(path), self.cfg, None, grayscale=self.input_nc == 1,
            rng=rng,
        )
        return {"A": a, "A_paths": path}
