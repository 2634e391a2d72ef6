"""Tunnel dispatch overhead + scan-chunk comparison at scene scale.

Measures (a) a near-no-op jitted dispatch on the full state, (b) the single
-step dispatch, (c) a lax.scan chunk of --chunk steps per dispatch. If (a)
is large, per-step dispatch latency inflates the published number and the
production path should be scan-chunked (Simulation.run already is).

Usage: python tools/dispatch_cost.py --scene data/scenes/large_scale_dfsph.json
"""
from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--chunk", type=int, default=25)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import bench
    from sph_project_tpu import sim as simlib

    if args.scene:
        from sph_project_tpu.scene import load_scene
        scene, state = load_scene(args.scene)
    else:
        scene, state = bench.build_synthetic(args.n)
    params = scene.params
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    float(state.t)
    print(f"# n_pad={params.n_pad}")

    def sync(s):
        float(jnp.sum(s.particles.pos[0]))

    def timeit(fn, s, reps):
        # chain from fn's own output: the step donates its input buffers
        cur = fn(s)
        sync(cur)
        t0 = time.perf_counter()
        for _ in range(reps):
            cur = fn(cur)
        sync(cur)
        return (time.perf_counter() - t0) / reps, cur

    # (a) near-no-op: touch one field so the dispatch isn't cached
    @jax.jit
    def noop(s):
        return s.replace(t=s.t + 1e-9)

    t_noop, state = timeit(noop, state, 20)

    # (b) single step
    step = simlib._jitted_step(params)
    st = state
    for _ in range(3):
        st, _ = step(st)
    float(st.t)
    t_step, st = timeit(lambda s: step(s)[0], st, args.reps * 2)

    # (c) scan chunk
    step_fn = simlib.get_step_fn(params)

    @functools.partial(jax.jit, static_argnums=1, donate_argnums=0)
    def scan_steps(s, n):
        def body(carry, _):
            carry, d = step_fn(carry)
            return carry, None
        return jax.lax.scan(body, s, None, length=n)[0]

    t_chunk, st = timeit(lambda s: scan_steps(s, args.chunk), st,
                         args.reps)

    print(f"no-op dispatch      {t_noop*1e3:8.1f} ms")
    print(f"single step         {t_step*1e3:8.1f} ms")
    print(f"scan[{args.chunk}] per step  "
          f"{t_chunk/args.chunk*1e3:8.1f} ms")


if __name__ == "__main__":
    main()
