"""TPU scatter/sort microbench for the sort+env pipeline (217 ms/step).

The full sort path (plane_padded_permutation + _occurrence_table +
permute_fields) is built from n-sized scatters, cumsums, and one stable
argsort. XLA lowers `.at[].set/min/max` very differently depending on
`unique_indices` / `indices_are_sorted` hints and on whether duplicates
exist — this times each primitive shape we actually use, plus candidate
replacements:

- perm scatter  : zeros.at[perm].set(idx)       (bijection — unique)
- occ min/max   : zeros.at[cells].min/max(idx)  (duplicates, ~sorted)
- boundary occ  : first-occurrence-only scatter (unique, sorted) + backfill
- stable argsort: jnp.argsort(cells)            (the baseline to beat)
- cumsum        : over n and over ncells

Usage: python tools/scatter_bench.py [--n 2400000 --ncells 1600000]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_972_224)
    ap.add_argument("--ncells", type=int, default=0,
                    help="0 = headline scene grid size")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    n = args.n
    ncells = args.ncells
    if not ncells:
        from sph_project_tpu.scene import load_scene
        scene, _ = load_scene("data/scenes/large_scale_dfsph.json")
        ncells = scene.params.num_cells
    print(f"# n={n} ncells={ncells}")

    rng = np.random.default_rng(0)
    # cell ids ascending with sentinels interspersed (the sorted layout)
    cells_np = np.sort(rng.integers(0, ncells, size=n).astype(np.int32))
    sent = rng.random(n) < 0.05
    cells_np[sent] = ncells
    cells = jnp.asarray(cells_np)
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    idx = jnp.arange(n, dtype=jnp.int32)

    def timeit(fn, *a):
        f = jax.jit(fn)
        o = f(*a, jnp.int32(0))
        jnp.asarray(o).ravel()[0].item()
        t0 = time.perf_counter()
        for i in range(args.reps):
            o = f(*a, jnp.int32(i + 1))
        jnp.asarray(o).ravel()[0].item()
        return (time.perf_counter() - t0) / args.reps * 1e3

    live = cells < ncells

    t = timeit(lambda p, eps: jnp.zeros((n,), jnp.int32)
               .at[p + eps * 0].set(idx), perm)
    print(f"perm scatter (plain)                    {t:8.2f} ms")
    t = timeit(lambda p, eps: jnp.zeros((n,), jnp.int32)
               .at[p + eps * 0].set(idx, unique_indices=True), perm)
    print(f"perm scatter (unique_indices)           {t:8.2f} ms")
    t = timeit(lambda c, eps: jnp.full((ncells + 1,), n, jnp.int32)
               .at[c + eps * 0].min(idx), cells)
    print(f"occ scatter-min (plain)                 {t:8.2f} ms")
    t = timeit(lambda c, eps: jnp.full((ncells + 1,), n, jnp.int32)
               .at[c + eps * 0].min(idx, indices_are_sorted=True), cells)
    print(f"occ scatter-min (indices_are_sorted)    {t:8.2f} ms")

    def boundary_occ(c, eps):
        c = c + eps * 0
        lv = c < ncells
        first = lv & jnp.concatenate(
            [jnp.ones((1,), bool), c[1:] != c[:-1]])
        tgt = jnp.where(first, c, ncells)
        t_start = jnp.full((ncells + 1,), n, jnp.int32).at[tgt].set(
            idx, mode="drop", unique_indices=True)
        return jax.lax.cummin(t_start, reverse=True)

    t = timeit(boundary_occ, cells)
    print(f"occ boundary scatter-set + backfill     {t:8.2f} ms")
    t = timeit(lambda c, eps: jnp.argsort(c + eps * 0, stable=True), cells)
    print(f"stable argsort (n)                      {t:8.2f} ms")
    t = timeit(lambda c, eps: jnp.cumsum(c + eps * 0), cells)
    print(f"cumsum over n                           {t:8.2f} ms")
    t = timeit(lambda c, eps: jnp.cumsum(
        jnp.zeros((ncells + 1,), jnp.int32) + eps), cells)
    print(f"cumsum over ncells                      {t:8.2f} ms")
    t = timeit(lambda c, eps: jax.lax.cummax(c + eps * 0), cells)
    print(f"cummax over n                           {t:8.2f} ms")
    # segment_sum histogram (plane counts use this)
    t = timeit(lambda c, eps: jax.ops.segment_sum(
        jnp.ones((n,), jnp.int32), jnp.minimum(c + eps * 0, ncells),
        num_segments=ncells + 1), cells)
    print(f"segment_sum histogram n->ncells         {t:8.2f} ms")
    # gather n rows from an ncells table (window st/en lookups)
    tab = jnp.arange(ncells + 1, dtype=jnp.int32)
    t = timeit(lambda c, eps: tab[jnp.minimum(c + eps * 0, ncells)], cells)
    print(f"gather n from (ncells,) table           {t:8.2f} ms")


if __name__ == "__main__":
    main()
