"""Small pytree utilities for ensemble/stacked states."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def tree_stack(trees):
    """Stack a list of identical-structure pytrees along a new leading axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def tree_unstack(tree, n: int):
    """Inverse of tree_stack: split the leading axis into a list of pytrees."""
    return [jax.tree.map(lambda x: x[i], tree) for i in range(n)]
