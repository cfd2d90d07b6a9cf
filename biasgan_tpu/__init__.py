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


def respect_platform_env() -> None:
    """Honor BIASGAN_PLATFORM=cpu|tpu in the CLI drivers. Needed because this
    environment's sitecustomize force-registers the axon TPU plugin and
    overrides JAX_PLATFORMS — tests/tools that must run CPU subprocesses
    (e.g. the kill-and-resume fault test) set BIASGAN_PLATFORM instead."""
    import os

    plat = os.environ.get("BIASGAN_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def enable_compile_cache(path: str = "") -> None:
    """Opt-in JAX persistent compilation cache (set BIASGAN_CACHE_DIR=<dir>):
    first compile of a full GAN train step is tens of seconds on TPU; with the
    cache, reruns are ~free. Called by every CLI driver but a NO-OP unless
    explicitly requested — on this environment's axon-tunnel TPU backend the
    persistent cache deadlocks execution (verified: any jitted computation
    hangs at host readback with the cache dir set), so it must never be the
    default."""
    import os

    cache = path or os.environ.get("BIASGAN_CACHE_DIR")
    if not cache:
        return
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
