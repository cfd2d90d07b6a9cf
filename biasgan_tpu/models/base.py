"""BaseModel: the reference-compatible OO wrapper over the functional cores.

Preserves the reference ``BaseModel`` public API (models/base_model.py,
SURVEY.md section 2.2 [K]) — ``setup`` / ``set_input`` / ``optimize_parameters`` /
``test`` / ``eval`` / ``get_current_losses`` / ``get_current_visuals`` /
``get_image_paths`` / ``save_networks`` / ``load_networks`` /
``update_learning_rate`` — while the actual compute is a single jitted (and
optionally shard_mapped) train step over a GANTrainState pytree.

Asynchronous by construction: optimize_parameters only enqueues the step;
losses are fetched (device sync) when get_current_losses is called, exactly
like the reference's print_freq cadence — so the TPU never waits on the host
between logging points.
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from biasgan_tpu.models.common import GANTrainState, make_lr_schedule
from biasgan_tpu.utils import checkpoint as ckpt


class BaseModel:
    """Subclasses define: loss_names, visual_names, net_names, and the three
    factory hooks _create_state / _make_train_step / _make_eval_fn."""

    loss_names: List[str] = []
    visual_names: List[str] = []
    net_names: List[str] = []

    def __init__(self, cfg):
        self.cfg = cfg
        from biasgan_tpu.config import is_train_config

        self.is_train = is_train_config(cfg)
        self.run_dir = cfg.run_dir()
        os.makedirs(self.run_dir, exist_ok=True)
        self._rng = jax.random.PRNGKey(cfg.seed)
        self._host_step = 0
        self._epoch = getattr(cfg, "epoch_count", 1)
        self._is_eval = False
        self._batch: Optional[Dict[str, Any]] = None
        self._paths: List[str] = []
        self._losses: Dict[str, jax.Array] = {}
        self._visuals: Dict[str, jax.Array] = {}
        self._plateau_best = float("inf")
        self._plateau_bad = 0

        self.state: GANTrainState = self._create_state(jax.random.PRNGKey(cfg.seed))

        self.mesh = None
        self._spatial_ctx = None
        axis_name = None
        data_n = max(int(getattr(cfg, "data_mesh", 1)), 1)
        spatial_n = (
            max(int(getattr(cfg, "spatial_mesh", 1)), 1) if self.is_train else 1
        )
        if data_n > 1 or spatial_n > 1:
            from biasgan_tpu.parallel import make_mesh

            self.mesh = make_mesh(data=data_n, spatial=spatial_n)
            names = tuple(self.mesh.axis_names)
            axis_name = names[0] if len(names) == 1 else names
        if spatial_n > 1:
            from biasgan_tpu.parallel.spatial import HaloCtx

            # spatially-sharded TRAINING: W (longitude) axis sharded, halo
            # exchange in every conv, pmean'd instance-norm stats/losses/
            # grads — the exact whole-field step (parallel/spatial.py)
            self._spatial_ctx = HaloCtx(
                axis="spatial",
                n_shards=spatial_n,
                periodic=getattr(cfg, "w_pad_mode", "") == "wrap",
            )

        self.steps_per_call = max(int(getattr(cfg, "steps_per_call", 1)), 1)
        if self.is_train:
            step = self._make_train_step(axis_name, self._spatial_ctx)
            if self.steps_per_call > 1:
                from biasgan_tpu.models.common import make_scan_step

                # composes with BOTH mesh axes: the scan runs INSIDE the
                # shard_map (k stacked batches, W- and/or B-sharded)
                step = make_scan_step(step, self.steps_per_call)
            if self._spatial_ctx is not None:
                from biasgan_tpu.parallel.spatial import spatial_train_step

                step = spatial_train_step(
                    step, self.mesh, cfg, scan_k=self.steps_per_call
                )
            elif self.mesh is not None:
                from biasgan_tpu.parallel import data_parallel_step

                step = data_parallel_step(
                    step, self.mesh, batch_axis=1 if self.steps_per_call > 1 else 0
                )
            # donate the state on every path (single-device, scan, DP mesh):
            # params + both optimizer states would otherwise double-buffer in
            # HBM each step — pure waste for a bandwidth-bound workload
            self._train_step = jax.jit(step, donate_argnums=0)
        self._eval_fn = jax.jit(self._make_eval_fn(), static_argnames=("train",))
        self._lr_fn = make_lr_schedule(cfg) if self.is_train else None

    # --- factory hooks -----------------------------------------------------
    def _create_state(self, rng) -> GANTrainState:
        raise NotImplementedError

    def _make_train_step(self, axis_name, ctx=None):
        raise NotImplementedError

    def _make_eval_fn(self):
        raise NotImplementedError

    # --- reference API -----------------------------------------------------
    def setup(self):
        """Load checkpoint if continuing/testing; print param counts
        (reference BaseModel.setup)."""
        cfg = self.cfg
        load = (not self.is_train) or getattr(cfg, "continue_train", False)
        if load:
            tag = f"iter_{cfg.load_iter}" if cfg.load_iter > 0 else cfg.epoch
            self.load_networks(tag)
        if cfg.verbose:
            self.print_networks()

    def set_input(self, data: Dict[str, Any]):
        """Store the batch (host numpy or device arrays); path metadata is
        carried on the host like the reference's A_paths/B_paths."""
        self._batch = {
            k: v for k, v in data.items() if not k.endswith("_paths")
        }
        # train drivers feed (k, B, ...) scan stacks under --steps_per_call;
        # eval-time callers (evaluate_metrics_on) feed plain batches
        self._batch_stacked = self.is_train and self.steps_per_call > 1
        self._paths = data.get("A_paths", data.get("B_paths", []))
        if self._spatial_ctx is not None:
            from biasgan_tpu.parallel.spatial import shard_batch_spatial

            self._batch = shard_batch_spatial(
                self._batch,
                self.mesh,
                scan=self.is_train and self.steps_per_call > 1,
            )
        elif self.mesh is not None:
            from biasgan_tpu.parallel import shard_batch

            self._batch = shard_batch(
                self._batch,
                self.mesh,
                batch_axis=1 if (self.is_train and self.steps_per_call > 1) else 0,
            )

    def optimize_parameters(self):
        rng = jax.random.fold_in(self._rng, self._host_step)
        self.state, self._losses, self._visuals = self._train_step(
            self.state, self._batch, rng
        )
        self._host_step += 1

    def test(self):
        """No-grad forward (reference model.test()); respects eval(). Each
        call draws fresh rng (its own counter, off the training stream) so
        test-time dropout varies per forward like the reference's."""
        self._eval_calls = getattr(self, "_eval_calls", 0) + 1
        rng = jax.random.fold_in(
            jax.random.fold_in(self._rng, 0x7E57), self._eval_calls
        )
        batch = self._batch
        if getattr(self, "_batch_stacked", False) and batch is not None:
            # under --steps_per_call the stored batch is a (k, B, ...) scan
            # stack; eval on the LAST step's batch so any caller of the
            # reference test() API gets a valid single-step forward
            batch = {k: v[-1] for k, v in batch.items()}
        self._visuals = self._eval_fn(
            self.state, batch, rng, train=not self._is_eval
        )

    def eval(self):
        self._is_eval = True

    def get_current_losses(self) -> Dict[str, float]:
        # multi-step (lax.scan) calls return per-step (k,) loss arrays;
        # report the most recent step, matching reference print semantics
        return {
            k: float(v[-1] if getattr(v, "ndim", 0) else v)
            for k, v in self._losses.items()
        }

    def check_finite(self, where: str = "", params: bool = False) -> None:
        """Sanitizer hook (--check_finite N, SURVEY.md section 5 sanitizer
        row): raise FloatingPointError naming the offending loss key if the
        last step produced a non-finite loss; with ``params=True`` also
        sweep every net's parameter tree (catches a NaN that reached the
        weights even when the printed losses still look clean)."""
        from biasgan_tpu.utils import diagnostics

        diagnostics.check_losses_finite(self.get_current_losses(), where)
        if params:
            for name, variables in self.state.nets.items():
                diagnostics.assert_finite(
                    {f"net{name}.params": variables},
                    where or f"step {self._host_step}",
                )

    def get_current_visuals(self) -> Dict[str, np.ndarray]:
        return {
            k: np.asarray(v)
            for k, v in self._visuals.items()
            if k in self.visual_names or not self.visual_names
        }

    def get_image_paths(self) -> List[str]:
        return self._paths

    def evaluate_metrics_on(self, data: Dict[str, Any]) -> Dict[str, float]:
        """Eval-mode forward on a HELD-OUT batch + in-graph metric bundle
        (spectral/PDF/per-pixel parity) — out-of-sample skill. Restores all
        training-facing state (batch, visuals, eval flag) afterwards, so
        display/save hooks never see the metric forward."""
        saved = (
            self._batch,
            self._paths,
            self._is_eval,
            self._visuals,
            getattr(self, "_batch_stacked", False),
        )
        try:
            batch = {k: v for k, v in data.items() if not k.endswith("_paths")}
            if self._spatial_ctx is not None:
                from biasgan_tpu.parallel.spatial import shard_batch_spatial

                batch = shard_batch_spatial(batch, self.mesh)
            elif self.mesh is not None:
                from biasgan_tpu.parallel import shard_batch

                batch = shard_batch(batch, self.mesh, batch_axis=0)
            self._batch = batch
            self._batch_stacked = False  # plain (B, ...) batch
            self._is_eval = True
            self.test()
            return self.compute_validation_metrics()
        finally:
            (
                self._batch,
                self._paths,
                self._is_eval,
                self._visuals,
                self._batch_stacked,
            ) = saved

    def compute_validation_metrics(self) -> Dict[str, float]:
        """In-graph spectral/PDF/per-pixel parity of the corrected field vs
        the target (BASELINE.json line 11), on the current visuals. Jitted
        once; returns name -> float."""
        if not hasattr(self, "_val_fn"):
            from biasgan_tpu.ops.metrics import validation_metrics

            # tanh outputs live in [-1, 1]; standardized fields ~N(0,1)
            bounded = getattr(self.cfg, "netG_activation", "tanh") == "tanh"
            lo, hi = (-1.0, 1.0) if bounded else (-5.0, 5.0)
            self._val_fn = jax.jit(
                lambda f, r: validation_metrics(f, r, lo, hi)
            )
        fake = self._visuals.get("fake_B")
        real = self._visuals.get("real_B")
        if fake is None or real is None:
            return {}
        return {k: float(v) for k, v in self._val_fn(fake, real).items()}

    def compute_visuals(self):  # reference hook (no-op for these models)
        pass

    def current_lr(self) -> float:
        if self._lr_fn is None:
            return 0.0
        return float(self._lr_fn(self.state.step, self.state.lr_scale))

    def set_epoch(self, epoch: int) -> None:
        """Sync the checkpoint-metadata epoch to the driver loop's epoch
        (the loop owns epoch numbering, as in the reference; the internal
        counter alone can lag when resuming from a crash-fallback
        checkpoint)."""
        self._epoch = epoch

    def update_learning_rate(self, metric: Optional[float] = None):
        """Epoch-end hook. linear/step/cosine run in-graph from the step
        counter; 'plateau' mirrors torch ReduceLROnPlateau(factor=0.2,
        threshold=0.01, patience=5) on the host via state.lr_scale."""
        self._epoch += 1
        if self.cfg.lr_policy == "plateau" and metric is not None:
            if metric < self._plateau_best * (1 - 0.01):
                self._plateau_best = metric
                self._plateau_bad = 0
            else:
                self._plateau_bad += 1
                if self._plateau_bad > 5:
                    self.state = self.state.replace(
                        lr_scale=self.state.lr_scale * 0.2
                    )
                    self._plateau_bad = 0
        return self.current_lr()

    # --- checkpointing ------------------------------------------------------
    def save_networks(self, tag):
        meta = {"host_step": self._host_step, "epoch": self._epoch}
        return ckpt.save_state(self.run_dir, str(tag), self.state, meta)

    def load_networks(self, tag):
        if self.is_train:
            # exact resume: restore the FULL state (params, both optimizer
            # states, step, lr_scale, pools) into the live structure
            self.state = ckpt.restore_state(
                self.run_dir, str(tag), ckpt.abstract_like(self.state)
            )
        else:
            # test-phase models are G-only (reference isTrain semantics) but
            # the checkpoint carries the whole training state: restore raw
            # and graft just the nets this model declares, so test.py needs
            # no knowledge of training-time D hyperparameters
            raw = ckpt.restore_raw(self.run_dir, str(tag))
            saved_nets = raw["nets"] if isinstance(raw, dict) else raw.nets
            missing = [n for n in self.state.nets if n not in saved_nets]
            if missing:
                raise KeyError(
                    f"checkpoint has nets {sorted(saved_nets)}; missing "
                    f"{missing} required by model {self.cfg.model!r}"
                )
            self.state = self.state.replace(
                nets={n: dict(saved_nets[n]) for n in self.state.nets}
            )
        meta = ckpt.load_meta(self.run_dir, str(tag))
        self._host_step = meta.get("host_step", int(self.state.step))
        self._epoch = meta.get("epoch", self._epoch)

    def print_networks(self):
        from biasgan_tpu.nn import count_params

        print("---------- Networks initialized -------------")
        for name in self.net_names:
            if name not in self.state.nets:
                continue  # test-phase models carry only their Gs
            n = count_params(self.state.nets[name])
            print(f"[Network {name}] Total number of parameters : {n/1e6:.3f} M")
        print("-----------------------------------------------")
