"""Pytree inspection helpers."""

from __future__ import annotations

import jax
import numpy as np


def tree_size(tree) -> int:
    """Total number of elements across all leaves."""
    return sum(np.prod(x.shape, dtype=int) for x in jax.tree.leaves(tree))


def tree_bytes(tree) -> int:
    return sum(
        int(np.prod(x.shape, dtype=int)) * x.dtype.itemsize
        for x in jax.tree.leaves(tree)
    )


def print_tree_summary(tree, name: str = "params") -> None:
    """Per-top-level-collection parameter counts (the closest analog of
    the reference's ``model.summary()`` calls, e.g. eval.py:26)."""
    total = tree_size(tree)
    print(f"{name}: {total:,} elements ({tree_bytes(tree) / 1e6:.1f} MB)")
    if isinstance(tree, dict):
        for key, sub in tree.items():
            print(f"  {key:>24}: {tree_size(sub):,}")
