"""Model layer: per-GAN-variant jitted train steps + reference-API wrappers.

``create_model(cfg)`` is the reference's entry point (models/__init__.py,
SURVEY.md section 3.4 [K]): string key -> model class -> instance.
"""

from biasgan_tpu.models.base import BaseModel
from biasgan_tpu.models import pix2pix  # noqa: F401 (registers 'pix2pix')
from biasgan_tpu.models import cyclegan  # noqa: F401 (registers 'cycle_gan')
from biasgan_tpu.models import test_model  # noqa: F401 (registers 'test')
from biasgan_tpu.models import template  # noqa: F401 (registers 'template')


def create_model(cfg) -> BaseModel:
    from biasgan_tpu.registry import get_model

    model = get_model(cfg.model)(cfg)
    if cfg.verbose:
        print(f"model [{type(model).__name__}] was created")
    return model
