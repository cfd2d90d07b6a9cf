"""Per-variable standardization statistics for climate fields.

Capability: the reference's precomputed per-variable mean/std standardization
(SURVEY.md section 2.2 "Climate data adapters" [I], BASELINE.json line 5).
Streams over HDF5 files accumulating sum/sumsq per variable (one pass, O(1)
memory) and caches the result as JSON next to the data.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Sequence

import numpy as np


def compute_stats(
    files: Sequence[str], variables: Sequence[str]
) -> Dict[str, Dict[str, float]]:
    import h5py

    acc = {v: [0.0, 0.0, 0] for v in variables}  # sum, sumsq, count
    for path in files:
        with h5py.File(path, "r") as f:
            for v in variables:
                ds = f[v]
                arr = np.asarray(ds, dtype=np.float64)
                acc[v][0] += float(arr.sum())
                acc[v][1] += float(np.square(arr).sum())
                acc[v][2] += int(arr.size)
    out = {}
    for v, (s, s2, n) in acc.items():
        mean = s / max(n, 1)
        var = max(s2 / max(n, 1) - mean * mean, 0.0)
        out[v] = {"mean": mean, "std": float(np.sqrt(var)) or 1.0}
    return out


def load_or_compute_stats(
    stats_path: str, files: Sequence[str], variables: Sequence[str]
) -> Dict[str, Dict[str, float]]:
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            stats = json.load(f)
        if all(v in stats for v in variables):
            return stats
    stats = compute_stats(files, variables)
    os.makedirs(os.path.dirname(stats_path) or ".", exist_ok=True)
    with open(stats_path, "w") as f:
        json.dump(stats, f, indent=2)
    return stats


def stats_arrays(
    stats: Dict[str, Dict[str, float]], variables: Sequence[str]
) -> tuple:
    mean = np.array([stats[v]["mean"] for v in variables], np.float32)
    std = np.array([stats[v]["std"] for v in variables], np.float32)
    return mean, std
