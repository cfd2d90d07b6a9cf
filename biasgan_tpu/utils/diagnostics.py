"""Network/grad diagnostics — capability parity with the reference's
``util.diagnose_network`` (util/util.py, SURVEY.md section 2.2 "Misc util" [K])
plus NaN guards built on the functional state (chex is the sanitizer tier,
SURVEY.md section 5 race-detection row).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp


def diagnose_network(variables: Any, name: str = "network") -> float:
    """Mean absolute value over all parameters (reference diagnose_network
    prints the mean abs gradient; with functional grads, pass the grad
    pytree). Prints and returns the value."""
    params = variables.get("params", variables) if isinstance(variables, dict) else variables
    leaves = [x for x in jax.tree_util.tree_leaves(params) if hasattr(x, "astype")]
    if not leaves:
        print(f"{name}: <no arrays>")
        return 0.0
    total = sum(jnp.sum(jnp.abs(x.astype(jnp.float32))) for x in leaves)
    count = sum(x.size for x in leaves)
    mean = float(total / count)
    print(name)
    print(mean)
    return mean


def count_nonfinite(tree: Any) -> Dict[str, int]:
    """Number of non-finite entries per top-level key — quick NaN/Inf hunt
    over params, grads or activations."""
    out = {}
    for key, sub in (tree.items() if isinstance(tree, dict) else [("tree", tree)]):
        leaves = jax.tree_util.tree_leaves(sub)
        out[key] = int(
            sum(jnp.sum(~jnp.isfinite(x.astype(jnp.float32))) for x in leaves)
        )
    return out


def assert_finite(tree: Any, where: str = "") -> None:
    """Raise if any leaf contains NaN/Inf (host-side check; for in-graph
    guards use jax.debug.nans or chex assertions)."""
    bad = {k: v for k, v in count_nonfinite(tree).items() if v}
    if bad:
        raise FloatingPointError(f"non-finite values {bad} {('in ' + where) if where else ''}")


def check_losses_finite(losses: Dict[str, float], where: str = "") -> None:
    """Driver-facing NaN guard (--check_finite N): raise naming the
    offending loss keys. Takes the already-synced host floats from
    model.get_current_losses(), so it adds zero device work beyond the
    print-point sync the driver was doing anyway."""
    import math

    bad = [k for k, v in losses.items() if not math.isfinite(v)]
    if bad:
        raise FloatingPointError(
            f"non-finite loss{'es' if len(bad) > 1 else ''} {bad}"
            f"{(' at ' + where) if where else ''} — a NaN/Inf has entered "
            "the optimization (try --debug_nans to locate the producing op)"
        )
