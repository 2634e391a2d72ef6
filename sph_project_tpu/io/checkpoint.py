"""Checkpoint / resume for SimState.

The reference has no restartable state at all — its only artifacts are
per-frame PLY/OBJ/PNG exports (SURVEY.md §5). Here the whole ``SimState``
pytree round-trips through a single compressed npz keyed by tree path, so a
run can resume bit-exactly (modulo device nondeterminism, which XLA avoids
for this workload — see tests/test_solvers.py determinism test).
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _flatten_with_names(state):
    leaves, treedef = jax.tree_util.tree_flatten_with_path(state)
    names = ["/".join(str(k) for k in path) for path, _ in leaves]
    vals = [v for _, v in leaves]
    return names, vals, treedef


def save(path: str, state) -> None:
    os.makedirs(path, exist_ok=True)
    names, vals, _ = _flatten_with_names(state)
    arrays = {f"leaf_{i}": np.asarray(v) for i, v in enumerate(vals)}
    np.savez_compressed(os.path.join(path, "state.npz"),
                        __names__=np.asarray(names, dtype=object),
                        **arrays)


def restore(path: str, template):
    """Restore into the structure of ``template`` (shapes must match)."""
    with np.load(os.path.join(path, "state.npz"), allow_pickle=True) as z:
        names = list(z["__names__"])
        leaves = [z[f"leaf_{i}"] for i in range(len(names))]
    t_names, t_vals, treedef = _flatten_with_names(template)
    if names != t_names:
        raise ValueError(f"checkpoint structure mismatch: {names[:3]}... vs "
                         f"{t_names[:3]}...")
    new_leaves = [jnp.asarray(a) for a in leaves]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
