"""Utilities: orbax checkpointing, in-graph ImagePool, visualizer, imaging."""
