"""Scanned-candidates diagnostic for the DMA pair engine.

Reports pair-evaluations per producing particle — the engine's padding/waste
metric (ROADMAP target: <= ~1300 at 1.23M; the ideal 27-cell stencil floor is
~1150). Computed from the same env metadata the kernel consumes: per
(half-block, plane slot, row slot) window [st, en), tile-clipped exactly like
the kernel's fori_loop bounds.

Usage: python tools/scan_stats.py [--n 400000 | --scene path.json]
"""
from __future__ import annotations

import argparse
import sys
import pathlib

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=400_000)
    ap.add_argument("--scene", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import bench
    from sph_project_tpu import sim as simlib
    from sph_project_tpu.ops import pair_dma
    from sph_project_tpu.core.params import MATERIAL_NONE

    if args.scene:
        from sph_project_tpu.scene import load_scene
        scene, state = load_scene(args.scene, pair_backend="pallas_dma")
    else:
        scene, state = bench.build_synthetic(args.n, backend="pallas_dma")
    params = scene.params
    state = jax.jit(lambda s: simlib.prepare(s, params))(state)
    state, cells, _, _ = simlib.sort_state(state, params)
    p = state.particles
    produces = simlib.produces_output(p, state.rigid, params)
    env = pair_dma.make_dma_env(p.pos, cells, params, needs_output=produces)

    G, R, Q = params.pair_dma_group, pair_dma.R_CAP, pair_dma.Q_CAP
    WT, DT, HB = pair_dma.WT, pair_dma.DT, pair_dma.HB
    meta = np.asarray(env.meta_pack)
    wtab = np.asarray(env.wtab)
    NSB = meta.shape[0]
    n = params.n_pad

    n_live = int(np.asarray(produces).sum())
    total = 0
    span_total = 0   # alignment-free bound: exact [st,en) spans, no WT clip
    tiles = 0
    for sb in range(NSB):
        m = meta[sb]
        w = wtab[sb].reshape(G * 2, 3, R, 2)
        qidx = m[pair_dma.OFF_QIDX:pair_dma.OFF_QIDX + G]
        rcnt = m[pair_dma.OFF_RCNT:pair_dma.OFF_RCNT + G * 2]
        for g_i in range(G):
            q = qidx[g_i]
            for hf in range(2):
                h = g_i * 2 + hf
                for sp in range(3):
                    slot = q * 3 + sp
                    useg = m[pair_dma.OFF_USTART + slot]
                    cap = m[pair_dma.OFF_UTILES + slot] * (DT // WT)
                    for rk in range(rcnt[h]):
                        st, en = w[h, sp, rk]
                        t_lo = max(st - useg, 0) // WT
                        t_hi = min((max(en - useg, 0) + WT - 1) // WT, cap)
                        nt = int(max(t_hi - t_lo, 0))
                        tiles += nt
                        total += nt * WT * HB
                        span_total += int(max(en - st, 0)) * HB
    print(f"n_pad={n} producing={n_live} NSB={NSB}")
    print(f"pair-evals total={total:.4g}  per producing particle="
          f"{total / max(n_live, 1):.0f}  tiles={tiles}")
    print(f"alignment-free span bound: total={span_total:.4g}  "
          f"per producing particle={span_total / max(n_live, 1):.0f}  "
          f"(the same row hulls if windows could start at any lane)")

    # 27-cell stencil floor: what a per-particle gather engine would touch —
    # sum of occupancy over each producing particle's 3^3 neighbor cells.
    # Unreachable for a dense-window engine (it shares scans across HB=32
    # producers and pays the plane-pad dead slots), but it is the honest
    # denominator for "scan waste".
    if params.dim == 3:
        gx, gy, gz = (int(v) for v in params.grid_num)
        c = np.asarray(cells)
        live = np.asarray(p.material) != MATERIAL_NONE
        occ = np.bincount(c[live & (c < gx * gy * gz)],
                          minlength=gx * gy * gz).reshape(gx, gy, gz)
        padded = np.zeros((gx + 2, gy + 2, gz + 2), np.int64)
        padded[1:-1, 1:-1, 1:-1] = occ
        conv = np.zeros_like(occ)
        for dx in (0, 1, 2):
            for dy in (0, 1, 2):
                for dz in (0, 1, 2):
                    conv += padded[dx:dx + gx, dy:dy + gy, dz:dz + gz]
        pr = np.asarray(produces)
        stencil = conv.reshape(-1)[c[pr]].astype(np.int64)
        print(f"27-cell stencil floor: total={stencil.sum():.4g}  "
              f"per producing particle={stencil.sum() / max(n_live, 1):.0f}")


if __name__ == "__main__":
    main()
