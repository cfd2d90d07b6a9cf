"""Import PyTorch ``state_dict`` checkpoints into this framework's param
pytrees (MIGRATION.md "Checkpoints": the reference family saves
``<epoch>_net_<name>.pth`` state_dicts; give its users a loader).

Layout contract (verified by tests/unit/test_torch_parity.py):
  conv     w_jax[kh, kw, ic, oc] = w_torch[oc, ic, kh, kw]
  convT    w_jax[kh, kw, ic, oc] = w_torch[ic, oc, kh, kw]  (flipped in-graph)
  batchnorm scale/bias = weight/bias; running mean/var -> batch_stats

Key translation: a torch key like ``downs.0.weight`` maps to this
framework's tree path ``down0/kernel``. The tables below cover the module
namings of our torch oracle (tests/unit/test_torch_parity.py — the
reference-semantics nets we can verify against in this environment; the
reference mount is empty, SURVEY.md section 0). Checkpoints with other
namings supply ``name_map`` — a {torch_prefix: tree_path} dict (JSON file
via tools/import_torch_weights.py --name_map).
"""

from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np

__all__ = ["convert_state_dict", "ORACLE_NAME_RULES"]

# (regex on the torch module prefix) -> tree path template.
# Oracle module namings per architecture family:
#   unet:     downs.{i}, down_norms.{i}, ups.{i}, up_norms.{i}
#   resnet:   stem, stem_norm, down{k}, down_norm{k}, blocks.{i}.conv{j},
#             blocks.{i}.norm{j}, up{k}, up_norm{k}, head
#   patchgan: convs.{n}, norms.{n}, out
ORACLE_NAME_RULES: Tuple[Tuple[str, str], ...] = (
    (r"^downs\.(\d+)$", r"down\1"),
    (r"^down_norms\.(\d+)$", r"down_norm\1"),
    (r"^ups\.(\d+)$", r"up\1"),
    (r"^up_norms\.(\d+)$", r"up_norm\1"),
    (r"^blocks\.(\d+)\.conv(\d+)$", r"block\1/conv\2"),
    (r"^blocks\.(\d+)\.norm(\d+)$", r"block\1/norm\2"),
    (r"^convs\.(\d+)$", r"conv\1"),
    (r"^norms\.(\d+)$", r"norm\1"),
    (r"^out$", r"conv_out"),
    # resnet stem/down0/up0/head and any other already-aligned names
    (r"^([A-Za-z_0-9]+)$", r"\1"),
)

_PARAM_SUFFIXES = ("weight", "bias", "running_mean", "running_var",
                   "num_batches_tracked")


def _module_prefix(key: str) -> Tuple[str, str]:
    for suf in _PARAM_SUFFIXES:
        if key.endswith("." + suf):
            return key[: -len(suf) - 1], suf
    raise ValueError(f"unrecognized state_dict key {key!r}")


def _tree_path(prefix: str, name_map: Optional[Dict[str, str]]) -> str:
    if name_map and prefix in name_map:
        return name_map[prefix]
    for pat, repl in ORACLE_NAME_RULES:
        if re.match(pat, prefix):
            return re.sub(pat, repl, prefix)
    raise KeyError(
        f"no rule maps torch module {prefix!r}; extend --name_map"
    )


def _set(tree: Dict, path: str, leaf_name: str, value: np.ndarray) -> None:
    node = tree
    for part in path.split("/"):
        node = node.setdefault(part, {})
    node[leaf_name] = value


def convert_state_dict(
    sd: Dict[str, np.ndarray],
    name_map: Optional[Dict[str, str]] = None,
    transpose_prefixes: Tuple[str, ...] = ("up",),
) -> Tuple[Dict, Dict]:
    """torch state_dict (numpy values) -> (params, batch_stats) trees.

    ``transpose_prefixes``: tree paths whose LAST component starts with one
    of these are ConvTranspose weights (torch IOHW) — the framework's up{i}
    convs; everything else 4-D is a regular conv (torch OIHW).
    BatchNorm modules are detected by their running stats and land in the
    nested ``BatchNorm_0`` scope the Norm wrapper creates.
    """
    modules: Dict[str, Dict[str, np.ndarray]] = {}
    for key, val in sd.items():
        prefix, suf = _module_prefix(key)
        modules.setdefault(prefix, {})[suf] = np.asarray(val)

    params: Dict = {}
    stats: Dict = {}
    for prefix, entries in modules.items():
        path = _tree_path(prefix, name_map)
        if "running_mean" in entries:  # a batch norm
            base = path + "/BatchNorm_0"
            _set(params, base, "scale", entries["weight"].astype(np.float32))
            _set(params, base, "bias", entries["bias"].astype(np.float32))
            _set(stats, base, "mean", entries["running_mean"].astype(np.float32))
            _set(stats, base, "var", entries["running_var"].astype(np.float32))
            continue
        w = entries.get("weight")
        if w is None or w.ndim != 4:
            if w is not None and w.ndim == 1:
                raise ValueError(
                    f"{prefix}: affine norm without running stats — the "
                    "framework's instance norm is affine-free (torch "
                    "InstanceNorm2d(affine=False)); this checkpoint was "
                    "trained with different norm settings"
                )
            raise ValueError(f"{prefix}: unsupported module shape")
        last = path.split("/")[-1]
        if any(last.startswith(p) for p in transpose_prefixes):
            kernel = w.transpose(2, 3, 0, 1)  # IOHW -> HWIO
        else:
            kernel = w.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        _set(params, path, "kernel", np.ascontiguousarray(kernel, np.float32))
        if "bias" in entries:
            _set(params, path, "bias", entries["bias"].astype(np.float32))
    return params, stats
