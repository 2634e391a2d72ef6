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
    """Restore into the structure of ``template``, matching leaves BY NAME
    (tree path) so state fields added after a checkpoint was written fall
    back to the template's value instead of invalidating the file. Leaves
    present in the checkpoint but absent from the template are dropped with
    a warning; shapes of matched leaves must agree."""
    with np.load(os.path.join(path, "state.npz"), allow_pickle=True) as z:
        names = list(z["__names__"])
        by_name = {str(n): z[f"leaf_{i}"] for i, n in enumerate(names)}
    t_names, t_vals, treedef = _flatten_with_names(template)
    if not set(t_names) & set(by_name):
        raise ValueError(
            f"checkpoint structure mismatch: no common leaves between "
            f"{sorted(by_name)[:3]}... and {t_names[:3]}...")
    new_leaves = []
    for name, tval in zip(t_names, t_vals):
        if name in by_name:
            a = by_name.pop(name)
            ts = getattr(tval, "shape", None)
            if ts is not None and tuple(a.shape) != tuple(ts):
                raise ValueError(
                    f"checkpoint leaf {name} shape {a.shape} != "
                    f"template {ts}")
            new_leaves.append(jnp.asarray(a))
        else:
            import warnings
            warnings.warn(f"checkpoint missing leaf {name}; "
                          f"keeping template value (new state field)")
            new_leaves.append(tval)
    if by_name:
        import warnings
        warnings.warn(f"checkpoint leaves not in template (dropped): "
                      f"{sorted(by_name)[:5]}")
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
