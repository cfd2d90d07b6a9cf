#!/usr/bin/env python
"""Training driver — reference train.py semantics (SURVEY.md section 3.1 [K]):

  parse config -> create_dataset -> create_model -> setup
  -> epoch loop { fetch batch -> set_input -> optimize_parameters
                  -> print/display/save at the reference cadences }
  -> update_learning_rate per epoch

e.g.  python train.py --model pix2pix --dataset_mode synthetic \
        --netG unet_d4 --crop_size 64 --input_nc 1 --output_nc 1 --batch_size 4

The hot loop enqueues one jitted step per batch; losses only sync the device
at --print_freq (get_current_losses), like the reference's print points.
"""

from __future__ import annotations

import os
import sys
import time

from biasgan_tpu import enable_compile_cache, respect_platform_env

respect_platform_env()
enable_compile_cache()
from biasgan_tpu.config import format_config, parse_config, save_config
from biasgan_tpu.data import create_dataset
from biasgan_tpu.models import create_model
from biasgan_tpu.utils.visualizer import Visualizer


def _avg_metrics(metric_dicts):
    """Mean of each metric over an iterable of name->float dicts."""
    total, count = {}, 0
    for m in metric_dicts:
        if not m:
            continue
        count += 1
        for k, v in m.items():
            total[k] = total.get(k, 0.0) + v
    return {k: v / count for k, v in total.items()} if count else {}


def _build_val_loader(cfg):
    """Held-out validation loader: --val_split N (last N samples of the
    dataset) or, for directory-backed datasets, a 'val' phase directory
    (e.g. climate valA/valB). Returns None when neither exists."""
    if getattr(cfg, "val_split", 0) > 0:
        return create_dataset(cfg, split="val")
    if cfg.dataset_mode in ("climate", "aligned", "unaligned", "single"):
        import dataclasses

        try:
            return create_dataset(dataclasses.replace(cfg, phase="val"))
        except FileNotFoundError:
            return None
    return None


def main(argv=None):
    cfg = parse_config(argv, train=True)
    if getattr(cfg, "debug_nans", False):
        import jax

        # locate the op that produces the first NaN (debugging runs only:
        # re-checks every primitive on host, orders slower than the guard
        # cadence of --check_finite)
        jax.config.update("jax_debug_nans", True)
    if getattr(cfg, "fused_blocks", False):
        from biasgan_tpu import perf_gates

        if not cfg.netG.startswith("resnet"):
            print(
                f"--fused_blocks: ignored — netG {cfg.netG!r} has no resnet "
                "block chain; using the plain path"
            )
        elif perf_gates.fused_blocks_engage(train=True):
            # training path: the block convs run conv3x3_fused_t (same
            # Pallas forward kernel + the exact custom VJP,
            # ops/pallas_conv.py)
            print(
                "--fused_blocks: fused training path engaged "
                "(conv3x3_fused_t; eligibility re-checked by the "
                "generator gate)"
            )
    dataset = create_dataset(
        cfg, split="train" if getattr(cfg, "val_split", 0) > 0 else None
    )
    cfg.steps_per_epoch = len(dataset)
    print(format_config(cfg))
    save_config(cfg)
    print(f"The number of training images = {dataset.num_samples}")
    val_loader = _build_val_loader(cfg)
    if val_loader is not None:
        print(f"The number of validation images = {val_loader.num_samples}")

    def val_batches(max_batches=None):
        for i, vb in enumerate(val_loader):
            if max_batches is not None and i >= max_batches:
                return
            yield vb

    model = create_model(cfg)
    model.setup()
    visualizer = Visualizer(cfg)
    total_iters = 0
    step_count = 0
    profiling = False

    spc = max(cfg.steps_per_call, 1)

    def batch_stream(ds):
        """Yield batches; for steps_per_call>1, yield (k, B, ...) stacks so
        one dispatch scans k optimization steps on device."""
        if spc == 1:
            yield from ds
            return
        from biasgan_tpu.models.common import stack_batches

        group = []
        for b in ds:
            group.append(b)
            if len(group) == spc:
                stacked = stack_batches(group)
                stacked["A_paths"] = group[-1].get("A_paths", [])
                yield stacked
                group = []
        # drop ragged tail: static shapes only under jit

    for epoch in range(cfg.epoch_count, cfg.n_epochs + cfg.n_epochs_decay + 1):
        model.set_epoch(epoch)
        epoch_start = time.time()
        t_data_mark = time.time()
        for data in batch_stream(dataset):
            t_data = time.time() - t_data_mark
            iter_start = time.time()
            total_iters += cfg.batch_size * spc

            # profiler window: steps 10-20 (post-compile, post-warmup)
            step_count += 1
            if cfg.profile and step_count == 10 and not profiling:
                import jax

                jax.profiler.start_trace(os.path.join(cfg.run_dir(), "profile"))
                profiling = True

            model.set_input(data)
            model.optimize_parameters()

            if cfg.check_finite and step_count % cfg.check_finite == 0:
                # sanitizer tier: raises FloatingPointError naming the
                # offending loss key; params swept every 10th check
                model.check_finite(
                    where=f"epoch {epoch}, iters {total_iters}",
                    params=(step_count % (10 * cfg.check_finite) == 0),
                )

            if profiling and step_count >= 20:
                import jax

                jax.block_until_ready(model.state.step)
                jax.profiler.stop_trace()
                profiling = False
                print(f"profile trace written to {cfg.run_dir()}/profile")

            if cfg.val_freq and total_iters % cfg.val_freq < cfg.batch_size * spc:
                # train-batch bundle (in-sample, from current visuals) ...
                metrics = model.compute_validation_metrics()
                if metrics:
                    visualizer.plot_current_metrics(total_iters, metrics)
                    print(
                        "validation (train batch): "
                        + " ".join(f"{k}: {v:.4f}" for k, v in metrics.items())
                    )
                # ... AND a held-out bundle in eval mode (out-of-sample
                # skill — the judged statistical-parity contract only means
                # something on unseen fields)
                if val_loader is not None:
                    vm = _avg_metrics(
                        model.evaluate_metrics_on(vb)
                        for vb in val_batches(max_batches=4)
                    )
                    if vm:
                        visualizer.plot_current_metrics(
                            total_iters, {f"val_{k}": v for k, v in vm.items()}
                        )
                        print(
                            "validation (held out): "
                            + " ".join(f"{k}: {v:.4f}" for k, v in vm.items())
                        )

            if total_iters % cfg.print_freq < cfg.batch_size * spc:
                losses = model.get_current_losses()  # device sync point
                # NOTE: "time:" in the loss line is enqueue+sync at PRINT
                # points only — optimize_parameters is async by design
                # (base.py), so between prints the per-iteration wall time is
                # not the step time. Reference-faithful log cadence; for real
                # step timing use bench.py (host-readback sync each window)
                # or --profile.
                t_comp = (time.time() - iter_start) / (cfg.batch_size * spc)
                visualizer.print_current_losses(
                    epoch, total_iters, losses, t_comp, t_data
                )
            if total_iters % cfg.display_freq < cfg.batch_size * spc:
                visualizer.display_current_results(
                    model.get_current_visuals(), epoch
                )
            if total_iters % cfg.save_latest_freq < cfg.batch_size * spc:
                print(f"saving latest (epoch {epoch}, total_iters {total_iters})")
                tag = f"iter_{total_iters}" if cfg.save_by_iter else "latest"
                model.save_networks(tag)
            t_data_mark = time.time()

        if epoch % cfg.save_epoch_freq == 0:
            print(f"saving model at end of epoch {epoch}, iters {total_iters}")
            model.save_networks("latest")
            model.save_networks(f"epoch_{epoch}")

        # plateau policy needs a tracked metric (torch ReduceLROnPlateau
        # semantics): RMSE of an EVAL-mode forward (no dropout, no aug) on
        # the last batch — train-mode visuals would track dropout noise and
        # one lucky batch could pin _plateau_best forever
        metric = None
        if cfg.lr_policy == "plateau":
            if val_loader is not None:
                # the tracked metric is HELD-OUT RMSE over the val split
                # (eval mode) — the only signal that can see overfitting
                m = _avg_metrics(
                    model.evaluate_metrics_on(vb) for vb in val_batches()
                )
                metric = m.get("rmse") if m else None
            elif model._batch is not None:
                # no val data: fall back to an eval-mode forward on the
                # last training batch (in-sample; model.test() un-stacks
                # scan batches and evaluate-state is restored around it)
                saved_eval, saved_visuals = model._is_eval, model._visuals
                model._is_eval = True
                model.test()
                m = model.compute_validation_metrics()
                model._is_eval, model._visuals = saved_eval, saved_visuals
                metric = m.get("rmse") if m else None
            if metric is None:
                print("warning: plateau policy found no rmse metric; "
                      "lr will not decay this epoch")
        lr = model.update_learning_rate(metric)
        print(
            f"End of epoch {epoch} / {cfg.n_epochs + cfg.n_epochs_decay} \t "
            f"Time: {time.time() - epoch_start:.1f}s \t lr: {lr:.3e}"
        )

    from biasgan_tpu.utils.checkpoint import wait_for_saves

    wait_for_saves()  # async checkpoint writes must be durable before exit
    return model


if __name__ == "__main__":
    main(sys.argv[1:])
