#!/usr/bin/env python
"""Import a reference-family PyTorch ``.pth`` state_dict as a framework
checkpoint (MIGRATION.md "Checkpoints").

Builds the model from the given CLI flags (same flags as train.py), replaces
the named net's params/batch_stats with the converted torch weights, and
saves a normal checkpoint — immediately usable by test.py / infer.py /
train.py --continue_train.

Example:
  python tools/import_torch_weights.py --pth latest_net_G.pth --net G \\
      --tag imported -- --model pix2pix --netG unet_256 --norm batch \\
      --input_nc 3 --output_nc 3 --name run1 --checkpoints_dir ./checkpoints

Key naming: covers the verified oracle namings out of the box
(biasgan_tpu/utils/torch_import.py); other namings via --name_map map.json
({torch_module_prefix: tree/path}).
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--" in argv:
        split = argv.index("--")
        own, model_args = argv[:split], argv[split + 1 :]
    else:
        own, model_args = argv, []
    ap = argparse.ArgumentParser()
    ap.add_argument("--pth", required=True, help="torch state_dict file")
    ap.add_argument("--net", default="G", help="net name: G, D, G_A, ...")
    ap.add_argument("--tag", default="imported", help="checkpoint tag")
    ap.add_argument("--name_map", default="", help="JSON {torch_prefix: tree/path}")
    args = ap.parse_args(own)

    import torch

    from biasgan_tpu.config import parse_config
    from biasgan_tpu.models import create_model
    from biasgan_tpu.utils.torch_import import convert_state_dict

    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items()}
    name_map = None
    if args.name_map:
        with open(args.name_map) as f:
            name_map = json.load(f)
    params, stats = convert_state_dict(sd, name_map)

    cfg = parse_config(model_args, train=True)
    model = create_model(cfg)
    nets = dict(model.state.nets)
    if args.net not in nets:
        raise SystemExit(f"--net {args.net!r} not in model nets {sorted(nets)}")
    target = nets[args.net]

    # validate against the initialized tree before replacing
    import jax

    flat_new = dict(jax.tree_util.tree_flatten_with_path(params)[0])
    flat_old = dict(jax.tree_util.tree_flatten_with_path(target["params"])[0])
    missing = sorted(set(map(str, flat_old)) - set(map(str, flat_new)))
    extra = sorted(set(map(str, flat_new)) - set(map(str, flat_old)))
    if missing or extra:
        raise SystemExit(
            f"tree mismatch for net {args.net}:\n  missing from .pth: "
            f"{missing}\n  unexpected in .pth: {extra}"
        )
    for path, leaf in flat_old.items():
        got = flat_new[path].shape
        if tuple(got) != tuple(leaf.shape):
            raise SystemExit(f"shape mismatch at {path}: ckpt {got} vs net {leaf.shape}")

    new_net = dict(target)
    new_net["params"] = jax.tree_util.tree_map(np.asarray, params)
    if stats:
        new_net["batch_stats"] = jax.tree_util.tree_map(np.asarray, stats)
    nets[args.net] = new_net
    model.state = model.state.replace(nets=nets)
    model.save_networks(args.tag)
    from biasgan_tpu.utils.checkpoint import wait_for_saves

    wait_for_saves()
    print(f"imported {args.pth} -> {model.run_dir}/ckpt/{args.tag} (net {args.net})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
