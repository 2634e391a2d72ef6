"""VPU speed-of-light + pair-engine op-cost fit — the roofline inputs.

Three measurements on the live chip:

1. ``vpu_fma_peak``: a Pallas kernel whose body is a fori_loop of
   independent elementwise FMAs on VMEM-resident data — the practical
   per-core VPU ceiling in (8,128)-vreg f32 ops/s. Uses 16 independent
   accumulator vregs so FMA latency never serializes the chain.
2. ``engine op sweep``: the real DMA pair engine running geometry + k extra
   dependent FMAs per pair eval, k in {0, 16, 32, 64}. The fitted slope is
   the engine's marginal cost per vector op per tile INCLUDING all loop
   and addressing overhead; comparing it against (1) says whether pair
   compute runs at VPU speed.
3. The fixed residual (k=0 intercept minus the modeled geometry+output
   ops) is the per-tile floor: DMA issue/wait, window address scalar math,
   iota, bounds tests, accumulator adds.

Together with tools/scan_stats.py (pair-evals/pass and tiles/pass) these
numbers close the roofline: pass_time ~= tiles * (c_floor + ops * c_op),
and c_op vs the peak from (1) is the headroom statement.

Usage: python tools/vpu_peak.py --scene data/scenes/large_scale_dfsph.json
"""
from __future__ import annotations

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
REPO = pathlib.Path(__file__).resolve().parents[1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None)
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--peak-only", action="store_true",
                    help="only the XLA FMA-chain peak (CPU-smokeable)")
    ap.add_argument("--backend", default=None)
    ap.add_argument("--eng-lanes", type=int, default=1,
                    help="independent accumulator chains in the engine op "
                         "sweep: 1 = the deferred-accumulator dependent "
                         "shape (latency bound), 4 = issue-width probe")
    ap.add_argument("--skip-peak", action="store_true",
                    help="engine sweep only (skip the XLA/Pallas peaks)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    jax.config.update("jax_compilation_cache_dir", str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    # ---- 1. VPU FMA peak (fused XLA chains, single dispatch) ---------------
    # A Pallas fori_loop microbench is unusable here: Mosaic rejects partial
    # unrolls and the axon tunnel charges ~10 ms dispatch per call, swamping
    # any vreg-sized kernel. Instead: one jitted dispatch runs an FMA chain
    # of K ops per element over an N-element array, repeated M times by a
    # fori_loop carrying the array — memory traffic is N in + N out once,
    # compute is N*K*M FMAs, so for K*M in the thousands the measurement is
    # pure VPU throughput. Distinct multipliers per op stop any folding.
    if args.skip_peak:
        peak = 1.02e9    # measured vpu_peak_r5b.log (XLA fused chain)
        _skip = True
    else:
        _skip = False
    N = 1 << 22          # 4M f32 = 16 MiB: VMEM-blocked by XLA, HBM-cheap
    K = 64               # FMA ops per element per loop iteration
    M = 64               # fori_loop trips inside the dispatch

    def chain(y, lanes):
        # `lanes` independent accumulators, K//lanes dependent ops each:
        # lanes=1 is the latency-bound chain (the engine's deferred
        # accumulator shape), lanes=4 approaches the issue-width ceiling.
        accs = [y * (1.0 + 1e-9 * j) for j in range(lanes)]
        for i in range(K // lanes):
            for j in range(lanes):
                accs[j] = accs[j] * (1.0 + 1e-7 * (i * lanes + j + 1)) + 1e-9
        out = accs[0]
        for j in range(1, lanes):
            out = out + accs[j]
        return out

    def make_peak(lanes):
        @jax.jit
        def run(y):
            return jax.lax.fori_loop(
                0, M, lambda i, y: chain(y, lanes), y)
        return run

    y0 = jnp.full((N,), 1.0000001, jnp.float32)
    if not _skip:
        peak = None
    for lanes in (() if _skip else (1, 4)):
        run_peak = make_peak(lanes)
        float(jnp.sum(run_peak(y0)))  # warm
        t0 = time.perf_counter()
        R = 3
        out = y0
        for _ in range(R):
            out = run_peak(out)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / R
        rate = N * K * M / dt          # element-FMA/s
        vrate = rate / (8 * 128)       # (8,128)-vreg-FMA/s
        print(f"vpu_fma_peak lanes={lanes}: {vrate/1e9:.2f} Gvreg-FMA/s "
              f"({rate/1e12:.2f} Tfma/s f32, {dt*1e3:.1f} ms/call)")
        peak = vrate if peak is None else max(peak, vrate)

    # ---- 1b. true VPU ceiling (Pallas, VMEM-resident, no XLA loop) ---------
    # The XLA chain above is bound by XLA's fused-elementwise codegen (~1
    # vreg/cycle), not the VPU. Here the accumulator is a VMEM-resident
    # (256,128) block = 256 independent vregs; a scalar fori_loop applies
    # one FMA to the whole block per trip, so per trip the VPU sees 256
    # independent vreg-FMAs. Sweeping the trip count cancels dispatch and
    # block-load cost; the slope is the hardware FMA ceiling.
    from jax.experimental import pallas as pl

    BLK = 256

    def make_pallas(k_outer):
        def kern(a_ref, o_ref):
            a = a_ref[...]

            def body(i, acc):
                return acc * 1.0000001 + 1e-9

            o_ref[...] = jax.lax.fori_loop(0, k_outer, body, a)

        return jax.jit(lambda a: pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((BLK, 128), jnp.float32),
            interpret=jax.default_backend() != "tpu",
        )(a))

    ablk = jnp.full((BLK, 128), 1.0000001, jnp.float32)
    if _skip:
        ks_p = []
    else:
        ks_p = [4096, 16384] if jax.default_backend() == "tpu" else [16, 64]
    times_p = []
    for k_outer in ks_p:
        f = make_pallas(k_outer)
        float(jnp.sum(f(ablk)))
        samples = []
        x = ablk
        for _ in range(7):
            t0 = time.perf_counter()
            x = x * (1.0 + 1e-9)   # chain inputs: dodge the result cache
            float(jnp.sum(f(x)))
            samples.append(time.perf_counter() - t0)
        times_p.append(sorted(samples)[len(samples) // 2])
        print(f"pallas block-FMA k_outer={k_outer}: "
              f"{times_p[-1]*1e3:.2f} ms/call")
    if len(times_p) == 2:
        dvregs = (ks_p[1] - ks_p[0]) * (BLK // 8)
        ceil = dvregs / (times_p[1] - times_p[0])
        print(f"vpu ceiling (pallas slope): {ceil/1e9:.2f} Gvreg-FMA/s "
              f"({ceil/0.94e9:.2f} vreg-FMA/cycle at 940 MHz)")

    if args.peak_only:
        return

    # ---- 2. engine op sweep ------------------------------------------------
    import bench
    from sph_project_tpu import sim as simlib
    from sph_project_tpu.ops import pair_exec
    from sph_project_tpu.solvers import common, dfsph

    if args.scene:
        from sph_project_tpu.scene import load_scene
        scene, state = load_scene(args.scene)
    else:
        scene, state = bench.build_synthetic(args.n)
    params = scene.params
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    step = simlib._jitted_step(params)
    for _ in range(3):
        state, _ = step(state)
    float(state.t)
    print(f"# n_pad={params.n_pad} su={params.pair_dma_su}")

    def timeit(fn, reps=args.reps):
        s = fn(state, 0.0)
        float(jnp.sum(s.particles.pos[0]))
        t0 = time.perf_counter()
        eps = 1e-9
        for i in range(reps):
            s = fn(state, (i + 1) * eps)
        float(jnp.sum(s.particles.pos[0]))
        return (time.perf_counter() - t0) / reps

    LANES = max(1, args.eng_lanes)

    def make(k_ops):
        @jax.jit
        def run(s, eps):
            p = s.particles.replace(pos=s.particles.pos + eps)
            env = s.cached_neighbors

            def kern(cx):
                _, d2, mask = cx.geometry()
                # LANES independent FMA chains of k_ops/LANES each, all
                # rooted at d2 (un-fusable, un-hoistable): LANES=1 is the
                # engine's deferred-accumulator dependent shape (FMA-latency
                # bound); LANES=4 probes the VPU issue-width ceiling with
                # the identical surrounding engine code.
                accs = [d2 * (1.0 + 1e-8 * (j + 1)) for j in range(LANES)]
                for i in range(k_ops // LANES):
                    for j in range(LANES):
                        accs[j] = accs[j] * (
                            1.0 + 1e-7 * (i * LANES + j + 1)) + 1e-9
                acc = accs[0]
                for j in range(1, LANES):
                    acc = acc + accs[j]
                return {"qa": cx.sum(acc, mask)}
            out = pair_exec.run(kern, env, {}, {"pos": p.pos}, params)
            return s.replace(particles=s.particles.replace(
                density=s.particles.density + 0.0 * out["qa"]))
        return run

    ks = [0, 16, 32, 64]
    ts = []
    for k in ks:
        t = timeit(make(k))
        ts.append(t)
        print(f"pass geometry + {k:3d} extra fma   {t*1e3:7.1f} ms")

    # least-squares slope over the sweep
    import numpy as np
    A = np.stack([np.asarray(ks, np.float64), np.ones(len(ks))], axis=1)
    slope, icept = np.linalg.lstsq(A, np.asarray(ts), rcond=None)[0]
    print(f"fit: {icept*1e3:.1f} ms + {slope*1e3:.4f} ms/op")
    # each extra op runs on a (1, HB, WT) = (1,32,128) tile = 4 vregs
    # engine-side effective vreg throughput for the marginal op:
    from sph_project_tpu.ops import pair_dma
    # count tiles like tools/scan_stats.py: evals = tiles * HB * WT
    env = state.cached_neighbors
    meta = np.asarray(env.meta_pack)
    wtab = np.asarray(env.wtab)
    G = env.group
    NSB = params.n_pad // (pair_dma.B * G)
    tiles = 0
    for sb in range(NSB):
        m = meta[sb]
        for g_i in range(G):
            q_i = m[pair_dma.OFF_QIDX + g_i]
            for hf in range(2):
                rcnt = m[pair_dma.OFF_RCNT + g_i * 2 + hf]
                wbase = (g_i * 2 + hf) * (3 * pair_dma.R_CAP * 2)
                for sp in range(3):
                    slot = q_i * 3 + sp
                    useg = m[pair_dma.OFF_USTART + slot]
                    cap = m[pair_dma.OFF_UTILES + slot] * (
                        pair_dma.DT // pair_dma.WT)
                    for rk in range(rcnt):
                        st = wtab[sb, wbase + (sp * pair_dma.R_CAP + rk) * 2]
                        en = wtab[sb, wbase + (sp * pair_dma.R_CAP + rk) * 2 + 1]
                        t_lo = max(st - useg, 0) // pair_dma.WT
                        t_hi = min((max(en - useg, 0) + pair_dma.WT - 1)
                                   // pair_dma.WT, cap)
                        tiles += max(t_hi - t_lo, 0)
    vregs_per_op = (pair_dma.HB * pair_dma.WT) // (8 * 128)
    eng_rate = tiles * vregs_per_op / slope if slope > 0 else float("inf")
    print(f"tiles/pass={tiles}  engine marginal rate: "
          f"{eng_rate/1e9:.2f} Gvreg-op/s  "
          f"(vs VPU fma peak {peak/1e9:.2f} -> "
          f"{100*eng_rate/peak:.0f}% of peak)")
    floor_ns = icept / tiles * 1e9
    print(f"per-tile cost at k=0: {floor_ns:.1f} ns "
          f"({floor_ns*0.94:.0f} cycles at 940 MHz)")


if __name__ == "__main__":
    main()
