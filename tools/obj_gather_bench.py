"""Micro-bench: per-particle object-table reads/reductions on TPU.

The rigid coupling path reads small (O, ...) body tables at every particle
(table[obj] gathers) and reduces per-particle wrenches back to bodies
(segment_sum). XLA gathers run at ~7 ns/element (round-2 measurement) and
scatters have their own costs; a one-hot MXU contraction does the same job
as a matmul. This times, at N=1M / O=16:
  - gather  (N,22) <- table[obj]            vs one-hot @ table
  - segsum  (O,3)  <- segment_sum(vals,obj) vs one-hot^T @ vals
  - segment_min over N (extents)            (no matmul analogue)

Usage: python tools/obj_gather_bench.py [--n 1048576] [--o 16]
"""
from __future__ import annotations

import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1 << 20)
    ap.add_argument("--o", type=int, default=16)
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    N, O = args.n, args.o
    key = jax.random.PRNGKey(0)
    obj = jax.random.randint(key, (N,), 0, O, dtype=jnp.int32)
    table = jax.random.normal(key, (O, 22), jnp.float32)
    vals = jax.random.normal(key, (N, 3), jnp.float32)

    def timeit(fn, *xs):
        f = jax.jit(fn)
        r = f(*xs)
        jax.block_until_ready(r)
        # chain a scalar through inputs so the result cache can't serve reps
        t0 = time.perf_counter()
        eps = jnp.float32(0)
        for i in range(args.reps):
            r = f(*[x + (eps * i if x.dtype == jnp.float32 else 0)
                    for x in xs])
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / args.reps

    t_gather = timeit(lambda t, o: t[o], table, obj)
    def onehot_gather(t, o):
        oh = (o[:, None] == jnp.arange(O, dtype=o.dtype)[None]).astype(
            jnp.float32)
        return jax.lax.dot_general(
            oh, t, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    t_oh_g = timeit(onehot_gather, table, obj)

    t_seg = timeit(
        lambda v, o: jnp.stack([
            jax.ops.segment_sum(v[:, d], o, num_segments=O)
            for d in range(3)], -1), vals, obj)
    def onehot_reduce(v, o):
        oh = (o[:, None] == jnp.arange(O, dtype=o.dtype)[None]).astype(
            jnp.float32)
        return jax.lax.dot_general(
            oh, v, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST)
    t_oh_r = timeit(onehot_reduce, vals, obj)

    t_segmin = timeit(
        lambda v, o: jax.ops.segment_min(v, o, num_segments=O), vals, obj)
    # min via masked where + per-object reduction (fused O passes)
    def masked_min(v, o):
        eq = o[None, :, None] == jnp.arange(O, dtype=o.dtype)[:, None, None]
        return jnp.min(jnp.where(eq, v[None], jnp.inf), axis=1)
    t_mmin = timeit(masked_min, vals, obj)

    print(f"# N={N} O={O}")
    print(f"table[obj] (N,22) gather      {t_gather*1e3:8.2f} ms")
    print(f"one-hot @ table               {t_oh_g*1e3:8.2f} ms")
    print(f"segment_sum (N,3)->O          {t_seg*1e3:8.2f} ms")
    print(f"one-hot^T @ vals              {t_oh_r*1e3:8.2f} ms")
    print(f"segment_min (N,3)->O          {t_segmin*1e3:8.2f} ms")
    print(f"masked-min O passes           {t_mmin*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
