"""Peak-HBM envelope for a scene's jitted step (VERDICT r2 #8).

Reports, for a given scene / synthetic size:
- the analytic resident-state budget (particle pytree + neighbor env
  + packed per-pass matrices), computed from shapes without running;
- the device-reported peak (``device.memory_stats()``) after compile +
  a few steps, when the backend exposes it (the axon tunnel may not).

Usage:
  python tools/memory_envelope.py --scene data/scenes/large_scale_dfsph.json
  python tools/memory_envelope.py --n 1230000 --analytic-only
"""
from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def tree_bytes(tree) -> int:
    import jax
    return sum(np.dtype(x.dtype).itemsize * int(np.prod(x.shape))
               for x in jax.tree.leaves(tree) if hasattr(x, "dtype"))


def fmt(b: int) -> str:
    return f"{b / 2**30:.2f} GiB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--n", type=int, default=0)
    ap.add_argument("--analytic-only", action="store_true",
                    help="no device run: shapes on CPU via eval_shape")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--backend", default=None)
    args = ap.parse_args()

    import jax
    if args.analytic_only:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp  # noqa: F401

    import bench
    from sph_project_tpu import sim as simlib

    if args.n:
        scene, state = bench.build_synthetic(args.n, args.backend)
        workload = f"synthetic cube {args.n}"
    else:
        from sph_project_tpu.scene import load_scene
        kw = {"pair_backend": args.backend} if args.backend else {}
        scene, state = load_scene(args.scene, **kw)
        workload = args.scene
    params = scene.params

    print(f"# {workload}: n_particles={params.n_particles} "
          f"n_pad={params.n_pad} su={params.pair_dma_su} "
          f"grid={params.grid_num}")

    # --- analytic resident budget ---------------------------------------
    state_b = tree_bytes(state)
    env_shape = jax.eval_shape(
        lambda s: simlib.Plumbing.neighbor_prep(s, params,
                                                exact_sort=True)[1], state)
    env_b = tree_bytes(env_shape)
    prep_shape = jax.eval_shape(lambda s: simlib.prepare(s, params), state)
    prep_b = tree_bytes(prep_shape)
    print(f"analytic: raw state {fmt(state_b)}  prepared state "
          f"{fmt(prep_b)}  neighbor env {fmt(env_b)}")
    print(f"analytic resident (prepared + env, donated step): "
          f"{fmt(prep_b + env_b)}")

    if args.analytic_only:
        # transient estimate: the step's biggest single intermediate is the
        # per-pass packed matrix (F_pad, NSB*G*B + SU) plus the sorted-field
        # copies during env rebuild (~2x carried fields)
        return

    # --- device run -----------------------------------------------------
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    float(state.t)
    step = simlib._jitted_step(params)
    for _ in range(args.steps):
        state, diag = step(state)
    float(state.t)
    dev = jax.local_devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    if not stats:
        print("device memory_stats: unavailable on this backend")
        return
    for k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit",
              "largest_alloc_size"):
        if k in stats:
            print(f"device {k}: {fmt(stats[k])}")


if __name__ == "__main__":
    main()
