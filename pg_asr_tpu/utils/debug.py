"""Numerical debugging helpers.

The reference carries a dead recursive NaN scrubber (reference
model.py:27-32) hinting NaNs were a concern. TPU-native equivalents:
  * enable_nan_checks(): flips jax_debug_nans so the first NaN-producing op
    raises with a stack trace (use in tests / debugging runs);
  * sanitize_pytree(): one fused jnp.nan_to_num across a whole pytree;
  * assert_all_finite(): raising check for use at step boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def enable_nan_checks(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def sanitize_pytree(tree, replace: float = 0.0):
    """Replace NaN/Inf in every leaf (vectorized, no Python recursion over
    tensor contents)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.nan_to_num(x, nan=replace, posinf=replace, neginf=replace)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def assert_all_finite(tree, name: str = "pytree") -> None:
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            if not bool(jnp.all(jnp.isfinite(leaf))):
                bad.append(jax.tree_util.keystr(path))
    if bad:
        raise FloatingPointError(f"non-finite values in {name}: {bad[:5]}")
