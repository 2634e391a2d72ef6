"""Debug the VPU peak microbench: backend id, interpret flag, K/unroll sweep."""
from __future__ import annotations

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
REPO = pathlib.Path(__file__).resolve().parents[1]

import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
from jax.experimental import pallas as pl

print("default_backend:", jax.default_backend())
print("device platform:", jax.devices()[0].platform, jax.devices()[0])

V = 16


def make(K, unroll):
    def peak_kernel(a_ref, o_ref):
        a = a_ref[...]
        b = a * 0.5 + 1.0

        def body(i, acc):
            return acc * a + b

        acc = jax.lax.fori_loop(0, K, body, a * 0.0 + 1.0,
                                unroll=unroll)
        o_ref[...] = acc

    return jax.jit(lambda a: pl.pallas_call(
        peak_kernel,
        out_shape=jax.ShapeDtypeStruct((8 * V, 128), jnp.float32),
        interpret=False,
    )(a))


a0 = jnp.full((8 * V, 128), 1.0000001, jnp.float32)
for K, unroll in [(100, 1), (1000, 1), (1000, 8), (10000, 8)]:
    f = make(K, unroll)
    out = f(a0)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    R = 5
    x = a0
    for i in range(R):
        x = x + 1e-9
        out = f(x)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / R
    rate = V * K / dt
    print(f"K={K:6d} unroll={unroll}: {dt*1e6:10.0f} us/call  "
          f"{rate/1e9:.2f} Gvreg-FMA/s ({rate*1024/1e12:.2f} Tflop)")
