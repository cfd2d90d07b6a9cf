"""biasgan_tpu — a TPU-native framework for GAN-based bias correction of
gridded climate/simulation fields.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the reference
framework (azrael417/Bias-GAN; see SURVEY.md for the capability inventory —
the reference mount was empty, so SURVEY.md section 2 is the authoritative
spec, with provenance tags).

Layer map (SURVEY.md section 1, "TPU-rebuild layer mapping"):
  nn/        -- network zoo (U-Net / ResNet generators, PatchGAN discriminators)
  losses.py  -- in-graph GAN / L1 / gradient-penalty losses
  models/    -- per-GAN-variant jitted train steps + TrainState pytrees
  data/      -- grain/h5py ingestion, in-graph standardization + augmentation
  parallel/  -- device mesh, shard_map data parallelism, halo-exchange spatial
                sharding (the sequence-parallel analog for global fields)
  ops/       -- Pallas TPU kernels + in-graph spectral/PDF metrics
  utils/     -- orbax checkpointing, in-graph ImagePool, visualizer
  config.py  -- dataclass config system with per-model/dataset flag injection
  registry.py-- name-keyed plugin registries (models, datasets)
"""

__version__ = "0.1.0"
