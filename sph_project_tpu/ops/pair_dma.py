"""Kernel-side-DMA dense pair engine — the TPU production path.

Round 1 materialized per-block slab windows in HBM with one `lax.gather`
slice per (block, segment, field); measured on v5e those slice gathers cost
~1us each and dominated the step. Here the Pallas kernel DMAs its own windows
straight out of one packed ``(F, N)`` field matrix, so nothing but the real
inputs and outputs ever touches HBM.

Design (replaces the ``for_all_neighbors`` hot loop of the reference,
``SPH/containers/base_container.py:549-560`` in jason-huang03/SPH_Project):

- particles stay cell-sorted (z fastest, then y, then x);
- a sub-block of ``B = 64`` particles shares a compute tile; ``G`` sub-blocks
  form a superblock whose windows are DMA'd once into VMEM;
- DMA granularity is the absolute x-PLANE: per superblock, each grid plane
  in the hull ``[xmin-1, xmax+1]`` gets one contiguous union window (from the
  first row/z corner of the hull to the last), double-buffered into VMEM in
  ``DT``-wide tiles. Planes are disjoint index ranges by construction;
- compute granularity is the (plane, row) window: per sub-block, each plane
  slot iterates the y-rows of the sub-block's hull; the row's candidate range
  ``[st, en)`` is two scalars looked up per (sub-block, plane, row) — NO
  per-particle range tables (round-1 design), and no per-pair row matching:
  the strict ``|R| < dh`` radius test alone implies cell membership, since
  cells are exactly ``dh`` wide. The scalar range test only enforces
  disjointness at the 128-lane tile granularity;
- pair validity = radius test + ``jg != gidx`` (not-self) + the scalar range
  test. Window truncation beyond the per-plane VMEM budget ``SU`` and hull
  spans beyond the static plane/row caps are counted in ``overflow`` (loud,
  never silent);
- outputs use deferred reduction: masked (1, B, WT) contribution matrices
  accumulate across tiles and reduce over lanes once per sub-block.

Pair kernels are the same :class:`~.pair_exec.Cx` component bodies the
chunked-JAX executor runs — written once, executed by either engine.
"""
from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import SimParams
from . import neighbors as nblib
from .pair_exec import Cx, _collect, _split

# static engine geometry
B = 64         # sub-block: particles per compute tile (sublane-aligned)
HB = 32        # half-block: row/z hulls and compute tiles are per HALF
               # sub-block — a sub-block straddling a y-row boundary would
               # otherwise scan the union row set (4-5 z-rows) with all 64
               # particles; per-half hulls cut each half back to ~3 rows
WT = 128       # window tile width (lanes)
DT = 512       # DMA tile width
ALIGN = 128    # union window start alignment
Q_CAP = 8      # own-plane clusters per superblock (sparse-scene cap)
R_CAP = 8      # row slots per half-block (y-hull width cap; last slot merges
               # any remaining rows into one contiguous range, so deep
               # y-hulls degrade to fatter scanning, never lost physics)

# meta row column offsets (one (256,) i32 row per superblock)
OFF_USTART = 0           # Q_CAP*3 entries: per-(cluster, dp) union start
OFF_UTILES = 24          # Q_CAP*3 entries: per-(cluster, dp) DMA tile count
OFF_DST = 48             # Q_CAP*3 entries: per-slot VMEM lane offset
OFF_RCNT = 72            # G*2 entries: row-slot count per half-block
OFF_QIDX = 88            # G entries: sub-block cluster index
OFF_NTOT = 96            # 1 entry: total DMA tiles this superblock
OFF_TSRC = 97            # TSRC_CAP entries: flattened per-tile HBM source
TSRC_CAP = 159           # (tile i lands at VMEM lane i*DT by construction)
META_W = 256


class DmaPairEnv(struct.PyTreeNode):
    """Window metadata for the DMA engine (all device arrays)."""

    meta_pack: jnp.ndarray   # (NSB_pad8, META_W) i32 — per-superblock row
    wtab: jnp.ndarray        # (NSB_pad8, G*3*R_CAP*2) i32 — [st, en) per
                             # (sub-block, plane slot, row slot)
    overflow: jnp.ndarray    # () i32 — candidates/windows lost to caps
    # sort-kernel repair shortfall folded into ``overflow`` by neighbor_prep
    # (zeroed particle records — corruption, not just missed candidates);
    # kept separately so diagnostics can tell the two apart
    sort_overflow: jnp.ndarray = None
    # incremental-sort crosser-budget component of sort_overflow (the rest
    # is the permute kernel's sparse-fix shortfall) — split so a hardware
    # diag can tell WHICH budget blew
    sort_overflow_inc: jnp.ndarray = None
    # hybrid inc-sort telemetry: max(movers, leavers) this step and whether
    # the incremental branch was taken (0 = the crossers exceeded the
    # budget and the step full-sorted)
    sort_crossers: jnp.ndarray = None
    sort_inc_taken: jnp.ndarray = None
    # layout snapshot for the NEXT step's incremental sort permutation
    # (params.sort_incremental): the exact cell ids this layout was sorted
    # by + their occurrence tables (neighbors.py
    # incremental_plane_padded_permutation)
    cells_sorted: jnp.ndarray = None
    t_start: jnp.ndarray = None
    t_end: jnp.ndarray = None
    # optional second env over the SAME layout whose windows cover only
    # dynamic-rigid producers — the rigid contact pass's (C+1)*(1+dim)
    # output channels spill VREGs, so running it over the shared env costs
    # ~7x a normal pass (measured 706 ms/step at coupling_nine_rigid);
    # against this env, fluid-only superblocks have empty hulls and the
    # zero-tile skip makes them free
    contact_env: "DmaPairEnv" = None

    # static config riders (stored as leaves would break jit; recompute)
    n: int = struct.field(pytree_node=False, default=0)
    su: int = struct.field(pytree_node=False, default=2048)
    group: int = struct.field(pytree_node=False, default=8)


def _occurrence_table(cells_sorted: jnp.ndarray, ncells: int):
    """Cell -> particle-index tables from the (plane-padded) sorted order.

    Built from positions directly (scatter-min/max + backfill scans) rather
    than a count cumsum, so dead padding slots interspersed between plane
    runs — and not-received halo slots under spatial decomposition — need no
    special casing. Returns (T_start, T_end): T_start[c] = first index of a
    live particle with cell >= c reading forward from c; T_end[c] = one past
    the last index of a live particle with cell <= c."""
    n = cells_sorted.shape[0]
    live = (cells_sorted >= 0) & (cells_sorted < ncells)
    idx = jnp.arange(n, dtype=jnp.int32)
    tgt = jnp.where(live, cells_sorted, ncells)
    t_start = jnp.full((ncells + 1,), n, jnp.int32).at[tgt].min(
        jnp.where(live, idx, n))
    t_end = jnp.zeros((ncells + 1,), jnp.int32).at[tgt].max(
        jnp.where(live, idx + 1, 0))
    # backfill empty cells so [T_start[lo], T_end[hi]) covers any cell range
    t_start = jax.lax.cummin(t_start, reverse=True)
    t_end = jax.lax.cummax(t_end)
    return t_start, t_end


def make_dma_env(pos: jnp.ndarray, cells_sorted: jnp.ndarray,
                 params: SimParams,
                 needs_output: jnp.ndarray | None = None,
                 keep_layout: bool = True) -> DmaPairEnv:
    """Plane/row window metadata from plane-padded sorted cell ids.

    ``needs_output``: per-particle bool; sub-blocks with no output-producing
    particle get empty hulls, and superblocks with none skip their DMAs
    entirely (static domain-box walls are the big win here).

    ``keep_layout=False`` suppresses the incremental-sort layout snapshot
    even when params.sort_incremental: an env built by a DIFFERENT program
    than the step (prepare()) must not offer itself as an inc-sort baseline
    — the step's own cell binning can disagree with the builder's on
    lattice edge-sitters (cross-program fusion rounding), and the inc path
    reads every disagreement as a cell-crosser (measured: ~712k phantom
    crossers at the 1.23M headline scene, blowing the crosser budget and
    zeroing records). Same-program comparisons (step k vs step k+1, the
    only ones left when prepare abstains) are exact by construction.
    """
    n, dim = pos.shape
    g = params.grid_num
    G = params.pair_dma_group
    SU = params.pair_dma_su
    SB = B * G
    assert n % SB == 0, f"n_pad {n} must be a multiple of {SB}"
    ncells = params.num_cells
    NSb = n // B
    NSB = n // SB

    # coords are DECODED from the sorted cell ids, never recomputed from
    # positions: edge-sitting particles round to different cells under
    # different XLA fusion contexts (fma vs mul+add), and any disagreement
    # with the layout the sort built silently degrades windows
    cid = jnp.clip(cells_sorted, 0, ncells - 1)
    if dim == 3:
        coords = jnp.stack([cid // (g[1] * g[2]),
                            (cid // g[2]) % g[1],
                            cid % g[2]], axis=1)
    else:
        coords = jnp.stack([cid // g[1], cid % g[1]], axis=1)
    t_start, t_end = _occurrence_table(cells_sorted, ncells)

    live = (cells_sorted < ncells) & (cells_sorted >= 0)
    produces = live if needs_output is None else (live & needs_output)

    # per-HALF-block hulls over producing rows (compute windows are per
    # half; DMA cluster unions below use the per-sub-block union of halves);
    # the plane-padded sort guarantees each live sub-block occupies a
    # single x-plane
    gi = jnp.asarray(g, jnp.int32)
    big = jnp.int32(1 << 29)
    NSh = n // HB
    hmin = jnp.min(jnp.where(produces[:, None], coords, big).reshape(
        NSh, HB, dim), axis=1)                                    # (NSh, dim)
    hmax = jnp.max(jnp.where(produces[:, None], coords, -big).reshape(
        NSh, HB, dim), axis=1)
    empty_h = ~jnp.any(produces.reshape(NSh, HB), axis=1)         # (NSh,)
    cmin = jnp.min(hmin.reshape(NSb, 2, dim), axis=1)             # (NSb, dim)
    cmax = jnp.max(hmax.reshape(NSb, 2, dim), axis=1)
    empty = empty_h.reshape(NSb, 2).all(axis=1)
    own = jnp.where(empty, 0, jnp.clip(cmin[:, 0], 0, g[0] - 1))  # (NSb,)
    multi_plane = (~empty) & (cmax[:, 0] != cmin[:, 0])

    if dim == 3:
        def flat(x, y, z):
            return (x * g[1] + y) * g[2] + z

        def hulls(lo, hi):
            return (jnp.maximum(lo[:, 1] - 1, 0),
                    jnp.minimum(hi[:, 1] + 1, gi[1] - 1),
                    jnp.maximum(lo[:, 2] - 1, 0),
                    jnp.minimum(hi[:, 2] + 1, gi[2] - 1))
    else:
        def flat(x, y, z):
            return x * g[1] + z

        # 2D: the window run axis is y; a single (merged) row slot
        def hulls(lo, hi):
            nsx = lo.shape[0]
            return (jnp.zeros((nsx,), jnp.int32),
                    jnp.zeros((nsx,), jnp.int32),
                    jnp.maximum(lo[:, 1] - 1, 0),
                    jnp.minimum(hi[:, 1] + 1, gi[1] - 1))

    ylo, yhi, zlo, zhi = hulls(cmin, cmax)                # (NSb,) DMA unions
    ylo_h, yhi_h, zlo_h, zhi_h = hulls(hmin, hmax)        # (NSh,) compute

    # ---- per-half-block row slots: OCCUPIED rows only ----------------------
    # Enumerating every row of the y-hull makes a sparse spray half-block
    # (few particles scattered over many y-rows) scan its whole hull span;
    # instead enumerate only the rows a particle actually needs (its own row
    # +-1), merging runs whose neighborhoods touch. Dense blocks reduce to
    # exactly the old hull rows. Rows beyond R_CAP still merge into the last
    # slot (fatter scanning, never lost physics). Exploits the sort order:
    # within a half-block (single x-plane) live y is non-decreasing.
    if dim == 3:
        g1 = gi[1]
        yh2 = coords[:, 1].reshape(NSh, HB)
        occ = produces.reshape(NSh, HB)
        prev = jnp.concatenate(
            [jnp.full((NSh, 1), -big, jnp.int32),
             jax.lax.cummax(jnp.where(occ, yh2, -big), axis=1)[:, :-1]],
            axis=1)
        gap = jnp.where(occ, yh2 - prev, 0)     # 0 for non-producing slots
        # candidate rows y-1/y/y+1; a candidate is NEW iff not already
        # covered by the previous occupied row's neighborhood (prev+1)
        vals = jnp.stack([yh2 - 1, yh2, yh2 + 1], axis=2)      # (NSh, HB, 3)
        newr = jnp.stack([(gap >= 3) & (yh2 - 1 >= 0),
                          gap >= 2,
                          (gap >= 1) & (yh2 + 1 <= g1 - 1)], axis=2)
        cnt = jnp.sum(newr.astype(jnp.int32), axis=2)          # (NSh, HB)
        base = jnp.cumsum(cnt, axis=1) - cnt                   # exclusive
        rank = jnp.stack(
            [base, base + newr[:, :, 0],
             base + newr[:, :, 0] + newr[:, :, 1]], axis=2)    # (NSh, HB, 3)
        m_rows = base[:, -1] + cnt[:, -1]
        rcnt_h = jnp.minimum(m_rows, R_CAP).astype(jnp.int32)  # (NSh,)
        ks = jnp.arange(R_CAP, dtype=jnp.int32)                # (R,)
        rf = rank.reshape(NSh, HB * 3, 1)
        vf = vals.reshape(NSh, HB * 3, 1)
        of = newr.reshape(NSh, HB * 3, 1)
        # > R_CAP needed rows: distribute them EVENLY over the slots
        # (contiguous runs of ceil(m/R_CAP) rows each) instead of 7 single
        # rows + one fat tail — bounds the worst slot's row span, and slot
        # boundaries falling on y-gaps skip the cells in between
        mr = jnp.maximum(m_rows, 1)[:, None, None]
        slot_of = jnp.where(m_rows[:, None, None] > R_CAP,
                            rf * R_CAP // mr, rf)
        hit = of & (slot_of == ks)
        row_lo = jnp.clip(jnp.min(jnp.where(hit, vf, big), axis=1),
                          0, g1 - 1)                           # (NSh, R)
        row_hi = jnp.clip(jnp.max(jnp.where(hit, vf, -big), axis=1),
                          0, g1 - 1)
    else:
        # 2D: the window run axis is z; a single merged slot over the z-hull
        rcnt_h = jnp.where(empty_h, 0, 1)
        row_lo = jnp.zeros((NSh, R_CAP), jnp.int32)
        row_hi = jnp.zeros((NSh, R_CAP), jnp.int32)

    # ---- superblock own-plane clusters ------------------------------------
    # sub-blocks of a superblock sharing an own plane form a CONTIGUOUS run
    # (the sort is cell-major); each run's rows span a contiguous y-interval,
    # so one DMA union per (cluster, dp) stays tight even when the superblock
    # straddles a plane boundary (a per-plane hull union would then span the
    # whole plane: both the low-y head of plane p+1 and the high-y tail of
    # plane p would fold into one rectangle)
    own_sb = own.reshape(NSB, G)
    empty_sb = empty.reshape(NSB, G)
    chg = jnp.concatenate(
        [jnp.ones((NSB, 1), jnp.int32),
         (own_sb[:, 1:] != own_sb[:, :-1]).astype(jnp.int32)], axis=1)
    q_idx = jnp.cumsum(chg, axis=1) - 1                           # (NSB, G)
    lost_q = jnp.sum(jnp.where(empty_sb, 0,
                               (q_idx >= Q_CAP).astype(jnp.int32))) * R_CAP
    q_idx_c = jnp.clip(q_idx, 0, Q_CAP - 1)

    # per-(cluster, dp) union hulls over that cluster's sub-blocks
    qs = jnp.arange(Q_CAP, dtype=jnp.int32)                       # (Q,)
    in_q = (q_idx_c[:, None, :] == qs[None, :, None]) & \
        (q_idx[:, None, :] < Q_CAP) & (~empty_sb[:, None, :])     # (NSB,Q,G)
    q_own = jnp.min(jnp.where(in_q, own_sb[:, None, :], big), axis=2)
    u_ylo = jnp.min(jnp.where(in_q, ylo.reshape(NSB, 1, G), big), axis=2)
    u_yhi = jnp.max(jnp.where(in_q, yhi.reshape(NSB, 1, G), -big), axis=2)
    u_zlo = jnp.min(jnp.where(in_q, zlo.reshape(NSB, 1, G), big), axis=2)
    u_zhi = jnp.max(jnp.where(in_q, zhi.reshape(NSB, 1, G), -big), axis=2)
    q_ok = jnp.any(in_q, axis=2)                                  # (NSB, Q)
    dpq = jnp.arange(3, dtype=jnp.int32)[None, None, :] - 1       # (1,1,3)
    plane_q = q_own[:, :, None] + dpq                             # (NSB,Q,3)
    slot_ok = q_ok[:, :, None] & (plane_q >= 0) & (plane_q < gi[0])
    u_lo_idx = flat(plane_q, u_ylo[:, :, None], u_zlo[:, :, None])
    u_hi_idx = flat(plane_q, u_yhi[:, :, None], u_zhi[:, :, None])
    u_start = jnp.where(
        slot_ok,
        t_start[jnp.clip(u_lo_idx, 0, ncells)] & ~(ALIGN - 1), 0)
    u_start = jnp.minimum(u_start, n)
    u_end = jnp.where(slot_ok, t_end[jnp.clip(u_hi_idx, 0, ncells)], 0)
    u_len = jnp.maximum(u_end - u_start, 0)
    # heterogeneous slot sizing: slots share one SU-lane VMEM budget via a
    # per-superblock running layout, so a sparse spray-edge block whose
    # cluster union spans a whole plane takes the lanes it needs instead of
    # hitting a fixed per-slot cap (the per-slot design truncated ~6k
    # candidates/step on the falling dam break)
    want = ((u_len + DT - 1) // DT).reshape(NSB, Q_CAP * 3)
    dst = jnp.concatenate(
        [jnp.zeros((NSB, 1), want.dtype),
         jnp.cumsum(want, axis=1)[:, :-1]], axis=1) * DT
    avail = jnp.maximum(SU - dst, 0) // DT
    u_tiles = jnp.minimum(want, avail).astype(jnp.int32)
    dst = jnp.minimum(dst, SU - DT).astype(jnp.int32)
    u_cover = (u_start.reshape(NSB, Q_CAP * 3) + u_tiles * DT)

    # ---- per-(half-block, +-1 plane, row) windows (compute side) ----------
    own_h = jnp.repeat(own, 2)                                    # (NSh,)
    q_half = jnp.repeat(q_idx.reshape(NSb), 2)                    # (NSh,)
    dp = jnp.arange(3, dtype=jnp.int32)[None, :, None] - 1        # (1,3,1)
    r3 = jnp.arange(R_CAP, dtype=jnp.int32)[None, None, :]        # (1,1,R)
    pg = own_h[:, None, None] + dp                                # (NSh,3,R)
    rg = row_lo[:, None, :]                                       # (NSh,1,R)
    rg_hi = row_hi[:, None, :]
    valid = (~empty_h[:, None, None]) & (pg >= 0) & (pg < gi[0]) & \
        (r3 < rcnt_h[:, None, None]) & (q_half[:, None, None] < Q_CAP)
    w_lo = flat(pg, rg, zlo_h[:, None, None])
    w_hi = flat(pg, rg_hi, zhi_h[:, None, None])
    st = jnp.where(valid, t_start[jnp.clip(w_lo, 0, ncells)], n)
    st = jnp.minimum(st, n)
    en = jnp.where(valid, t_end[jnp.clip(w_hi, 0, ncells)], 0)

    # SU truncation accounting (loud, never silent)
    sb_of = jnp.repeat(jnp.arange(NSB, dtype=jnp.int32), G * 2)
    slot_g = (jnp.clip(q_half, 0, Q_CAP - 1)[:, None] * 3 +
              jnp.arange(3, dtype=jnp.int32)[None, :])            # (NSh, 3)
    cover = jnp.take_along_axis(u_cover[sb_of], slot_g,
                                axis=1)[:, :, None]               # (NSh,3,1)
    trunc = jnp.sum(jnp.where(valid, jnp.maximum(en - cover, 0), 0))
    overflow = (trunc + lost_q + jnp.sum(multi_plane)).astype(jnp.int32)

    # flattened DMA tile list: tile i of the superblock copies DT lanes from
    # HBM lane tsrc[i] to VMEM lane i*DT (dst is the cumsum of DT-granular
    # slot sizes, so tiles pack contiguously) — the kernel issues/waits ONE
    # flat fori_loop instead of 2 x Q_CAP*3 per-slot loops
    assert SU // DT <= TSRC_CAP, (
        f"pair_dma_su {SU} exceeds the {TSRC_CAP}-tile meta budget")
    u_start_f = u_start.reshape(NSB, Q_CAP * 3)
    base_t = dst // DT                                    # (NSB, 24)
    ts = jnp.arange(TSRC_CAP, dtype=jnp.int32)            # (T,)
    in_slot = (ts[None, None, :] >= base_t[:, :, None]) & \
        (ts[None, None, :] < (base_t + u_tiles.reshape(NSB, -1))[:, :, None])
    tsrc = jnp.sum(jnp.where(
        in_slot,
        u_start_f[:, :, None] + (ts[None, None, :] - base_t[:, :, None]) * DT,
        0), axis=1).astype(jnp.int32)                     # (NSB, T)
    ntot = jnp.sum(u_tiles.reshape(NSB, -1), axis=1).astype(jnp.int32)

    nsb_pad = ((NSB + 7) // 8) * 8
    meta = jnp.zeros((nsb_pad, META_W), jnp.int32)
    meta = meta.at[:NSB, OFF_USTART:OFF_USTART + Q_CAP * 3].set(u_start_f)
    meta = meta.at[:NSB, OFF_UTILES:OFF_UTILES + Q_CAP * 3].set(
        u_tiles.reshape(NSB, Q_CAP * 3))
    meta = meta.at[:NSB, OFF_DST:OFF_DST + Q_CAP * 3].set(dst)
    meta = meta.at[:NSB, OFF_RCNT:OFF_RCNT + G * 2].set(
        rcnt_h.reshape(NSB, G * 2))
    meta = meta.at[:NSB, OFF_QIDX:OFF_QIDX + G].set(q_idx_c)
    meta = meta.at[:NSB, OFF_NTOT].set(ntot)
    meta = meta.at[:NSB, OFF_TSRC:OFF_TSRC + TSRC_CAP].set(tsrc)

    wtab = jnp.stack([st, en], axis=-1).reshape(NSB, G * 2 * 3 * R_CAP * 2)
    wtab = jnp.pad(wtab, ((0, nsb_pad - NSB), (0, 0)))
    keep = keep_layout and params.sort_incremental and not params.spmd_axis
    return DmaPairEnv(meta_pack=meta, wtab=wtab, overflow=overflow,
                      n=n, su=SU, group=G,
                      cells_sorted=cells_sorted if keep else None,
                      t_start=t_start if keep else None,
                      t_end=t_end if keep else None)


def estimate_su(pos: "np.ndarray", active: "np.ndarray", params: SimParams,
                margin: float = 2.2,
                output_mask: "np.ndarray" = None) -> int:
    """Host-side estimate of the per-superblock TOTAL window lane budget.

    Mirrors make_dma_env's superblock hull computation in numpy on the
    initial state; ``margin`` covers densification during the run and the
    runtime ``overflow`` counter guards the rest (JAX-MD rebuild protocol).
    """
    n, dim = pos.shape
    g = params.grid_num
    G = params.pair_dma_group
    SB = B * G
    ncells = int(np.prod(g))
    start_arr = np.asarray(params.domain_start, np.float32)
    q = (pos.astype(np.float32) - start_arr) / np.float32(params.support_radius)
    coords = np.clip(np.floor(q).astype(np.int64), 0, np.asarray(g) - 1)
    if dim == 3:
        flat = (coords[:, 0] * g[1] + coords[:, 1]) * g[2] + coords[:, 2]
        plane_stride = g[1] * g[2]
    else:
        flat = coords[:, 0] * g[1] + coords[:, 1]
        plane_stride = g[1]
    flat = np.where(active, flat, ncells)

    # mirror plane_padded_permutation: stable cell sort, plane runs padded to
    # B boundaries, inactive records fill the leftover slots (bijection)
    order = np.argsort(flat, kind="stable")
    cs = flat[order]
    pl_id = np.where(cs >= ncells, g[0], cs // plane_stride)
    counts = np.bincount(pl_id, minlength=g[0] + 1)
    base_sorted = np.concatenate([[0], np.cumsum(counts)[:-1]])
    padded = (counts + B - 1) // B * B
    base_pad = np.concatenate([[0], np.cumsum(padded)[:-1]])
    k = np.arange(n)
    sent = pl_id >= g[0]
    out_live = base_pad[np.minimum(pl_id, g[0] - 1)] + \
        (k - base_sorted[np.minimum(pl_id, g[0] - 1)])
    occupied = np.zeros(n, bool)
    occupied[out_live[~sent]] = True
    free = np.flatnonzero(~occupied)
    out_pos = out_live.copy()
    out_pos[sent] = free[k[sent] - base_sorted[g[0]]]
    perm = np.zeros(n, np.int64)
    perm[out_pos] = order
    cells_sorted = flat[perm]
    coords = coords[perm]
    live = cells_sorted < ncells
    if output_mask is not None:
        live = live & output_mask[perm]

    # occurrence tables (same as _occurrence_table)
    t_start = np.full(ncells + 1, n, np.int64)
    t_end = np.zeros(ncells + 1, np.int64)
    idx = np.arange(n)
    real = cells_sorted < ncells
    np.minimum.at(t_start, cells_sorted[real], idx[real])
    np.maximum.at(t_end, cells_sorted[real], idx[real] + 1)
    t_start = np.minimum.accumulate(t_start[::-1])[::-1]
    t_end = np.maximum.accumulate(t_end)

    NSb = n // B
    big = 1 << 29
    cmin = np.where(live[:, None], coords, big).reshape(
        NSb, B, dim).min(axis=1)
    cmax = np.where(live[:, None], coords, -big).reshape(
        NSb, B, dim).max(axis=1)
    nonempty = live.reshape(NSb, B).any(axis=1)
    own = np.clip(cmin[:, 0], 0, g[0] - 1)
    if dim == 3:
        ylo = np.maximum(cmin[:, 1] - 1, 0)
        yhi = np.minimum(cmax[:, 1] + 1, g[1] - 1)
        zlo = np.maximum(cmin[:, 2] - 1, 0)
        zhi = np.minimum(cmax[:, 2] + 1, g[2] - 1)
    else:
        ylo = np.zeros(NSb, np.int64)
        yhi = np.zeros(NSb, np.int64)
        zlo = np.maximum(cmin[:, 1] - 1, 0)
        zhi = np.minimum(cmax[:, 1] + 1, g[1] - 1)

    # per-superblock own-plane clusters, one union per (cluster, dp)
    NSB = n // SB
    own_sb = own.reshape(NSB, G)
    empty_sb = ~nonempty.reshape(NSB, G)
    chg = np.concatenate([np.ones((NSB, 1), np.int64),
                          (own_sb[:, 1:] != own_sb[:, :-1]).astype(np.int64)],
                         axis=1)
    q_idx = np.cumsum(chg, axis=1) - 1
    tot = np.zeros(NSB, np.int64)   # per-superblock total slot lanes
    for q in range(Q_CAP):
        in_q = (q_idx == q) & ~empty_sb
        ok_q = in_q.any(axis=1)
        if not ok_q.any():
            continue
        q_own = np.where(in_q, own_sb, big).min(axis=1)
        uy0 = np.where(in_q, ylo.reshape(NSB, G), big).min(axis=1)
        uy1 = np.where(in_q, yhi.reshape(NSB, G), -big).max(axis=1)
        uz0 = np.where(in_q, zlo.reshape(NSB, G), big).min(axis=1)
        uz1 = np.where(in_q, zhi.reshape(NSB, G), -big).max(axis=1)
        for dp in (-1, 0, 1):
            plane = q_own + dp
            ok = ok_q & (plane >= 0) & (plane < g[0])
            if not ok.any():
                continue
            if dim == 3:
                i_lo = (plane * g[1] + uy0) * g[2] + uz0
                i_hi = (plane * g[1] + uy1) * g[2] + uz1
            else:
                i_lo = plane * g[1] + uz0
                i_hi = plane * g[1] + uz1
            us = (t_start[np.clip(i_lo, 0, ncells)] & ~(ALIGN - 1))
            ue = t_end[np.clip(i_hi, 0, ncells)]
            span = np.where(ok, np.maximum(ue - us, 0), 0)
            tot += (span + DT - 1) // DT * DT

    su = int(np.ceil(max(int(tot.max()), 1) * margin / DT) * DT)
    return max(su, 2048)


class CxDma(Cx):
    """Cx view for the DMA engine: validity is the strict radius test plus a
    SCALAR per-(sub-block, plane, row) range test (tile-granularity
    disjointness); blocks/slabs are (1, B)/(1, WT) VMEM reads; sums are
    deferred (1, B, WT) contribution matrices the engine accumulates."""

    def __init__(self, blocks, slabs, jg, st, en, gidx, params):
        self._b = blocks
        self._s = slabs
        self._jg = jg          # (1, 1, WT) global candidate index
        self._st = st          # () scalar window start
        self._en = en          # () scalar window end
        self._gidx = gidx      # (1, B, 1) center global index
        self.params = params
        self.dim = params.dim

    def blk(self, name):
        # blocks arrive pre-shaped (1, B, 1): the (1, B) -> (1, B, 1) reshape
        # is a lane->sublane relayout, hoisted to once per sub-block
        return self._b[name]

    def slab(self, name):
        return self._s[name].reshape(1, 1, WT)

    def geometry(self, pos_blk: str = "pos", pos_slab: str = "pos",
                 strict: bool = True):
        R = tuple(self.blk(f"{pos_blk}{d}") - self.slab(f"{pos_slab}{d}")
                  for d in range(self.dim))
        d2 = sum(r * r for r in R)
        mask = (self._jg >= self._st) & (self._jg < self._en) & \
               (self._jg != self._gidx)
        if strict:
            mask = mask & (d2 < self.params.support_radius ** 2)
        return R, d2, mask

    @staticmethod
    def sum(x, mask):
        """Deferred reduction: return the masked (1, B, WT) contribution
        matrix; the engine accumulates matrices across window tiles and
        reduces over the lane axis ONCE per sub-block — the per-tile
        log-step lane reduction (7 full-vector ops per output per tile)
        was the dominant per-pair cost."""
        return jnp.where(mask, x, 0.0)


def _probe_shapes(kern, window_names, center_names, params):
    def probe(b_, s_):
        z = jnp.zeros
        cx = CxDma(b_, s_, z((1, 1, WT), jnp.int32), jnp.int32(0),
                   jnp.int32(0), z((1, HB, 1), jnp.int32), params)
        return kern(cx)
    bs = {k: jax.ShapeDtypeStruct((1, HB, 1), jnp.float32)
          for k in center_names}
    ss = {k: jax.ShapeDtypeStruct((1, WT), jnp.float32) for k in window_names}
    return jax.eval_shape(probe, bs, ss)


def _kernel(meta_ref, wtab_ref, fmat, *rest, kern, out_names, window_rows,
            center_rows, params, F_pad, NSB):
    G = params.pair_dma_group
    SB = B * G
    n_out = len(out_names)
    out_refs = rest[:n_out]
    win, cen, sem, csem = rest[n_out:]

    sb = pl.program_id(0)
    row = jax.lax.rem(sb, 8)

    # superblocks with zero window tiles produce provably-zero outputs (no
    # candidate tile ever enters the accumulators): skip their center DMA
    # and all scalar slot loops. At the headline scene 37% of slots are
    # static walls/pad, sorted contiguous — their superblocks take this
    # path, cutting the engine's fixed per-pass floor.
    ntot = meta_ref[row, OFF_NTOT]

    @pl.when(ntot == 0)
    def _zero_outputs():
        for oref in out_refs:
            oref[...] = jnp.zeros_like(oref)

    @pl.when(ntot > 0)
    def _body():
        _kernel_body(meta_ref, wtab_ref, fmat, out_refs, win, cen, sem,
                     csem, sb, row, ntot, kern=kern, out_names=out_names,
                     window_rows=window_rows, center_rows=center_rows,
                     params=params)


def _kernel_body(meta_ref, wtab_ref, fmat, out_refs, win, cen, sem, csem,
                 sb, row, ntot, *, kern, out_names, window_rows,
                 center_rows, params):
    G = params.pair_dma_group
    SB = B * G

    cstart = pl.multiple_of(sb * SB, 128)
    cdma = pltpu.make_async_copy(fmat.at[:, pl.ds(cstart, SB)], cen, csem)
    cdma.start()

    # flat DMA tile list: tile i copies DT lanes from HBM lane tsrc[i] to
    # VMEM lane i*DT, all on one semaphore — one issue loop + one wait loop
    # instead of 2 x Q_CAP*3 per-slot fori_loops of scalar bookkeeping

    def issue(t, _):
        src = pl.multiple_of(meta_ref[row, OFF_TSRC + t], 128)
        dst = pl.multiple_of(t * DT, 128)
        pltpu.make_async_copy(
            fmat.at[:, pl.ds(src, DT)],
            win.at[:, pl.ds(dst, DT)],
            sem).start()
        return 0
    jax.lax.fori_loop(0, ntot, issue, 0, unroll=False)

    cdma.wait()

    def wdone(t, _):
        pltpu.make_async_copy(
            fmat.at[:, pl.ds(0, DT)],
            win.at[:, pl.ds(0, DT)],
            sem).wait()
        return 0
    jax.lax.fori_loop(0, ntot, wdone, 0, unroll=False)

    # static sub-block loop: B = 64 center offsets are not 128-lane-aligned,
    # so centers are read in 128-wide pairs (static offsets) and sliced on
    # the sublane axis after the lane->sublane relayout; compute runs per
    # HALF-block (HB = 32) so each half scans only its own row hull
    for g_i in range(G):
        pair_off = (g_i // 2) * 128
        half = (g_i % 2) * B
        pair_blocks = {
            name: cen[r:r + 1, pair_off:pair_off + 128].reshape(1, 128, 1)
            for name, r in center_rows.items()}
        q_i = meta_ref[row, OFF_QIDX + g_i]

        for hf in range(2):
            off = half + hf * HB
            blocks = {name: v[:, off:off + HB, :]
                      for name, v in pair_blocks.items()}
            gidx = (sb * SB + g_i * B + hf * HB +
                    jax.lax.broadcasted_iota(jnp.int32, (1, HB, 1), 1))
            rcnt = meta_ref[row, OFF_RCNT + g_i * 2 + hf]
            wbase = (g_i * 2 + hf) * (3 * R_CAP * 2)
            # deferred reduction: accumulate full (1, HB, WT) contribution
            # matrices across tiles, reduce over lanes once per half-block
            accs = tuple(jnp.zeros((1, HB, WT), jnp.float32)
                         for _ in out_names)

            for sp in range(3):   # own plane -1 / 0 / +1
                slot = q_i * 3 + sp
                useg = meta_ref[row, OFF_USTART + slot]
                cap = meta_ref[row, OFF_UTILES + slot] * (DT // WT)
                dst_s = meta_ref[row, OFF_DST + slot]

                def row_body(rk, accs, sp=sp, slot=slot, useg=useg, cap=cap,
                             dst_s=dst_s, wbase=wbase, blocks=blocks,
                             gidx=gidx):
                    st = wtab_ref[row, wbase + (sp * R_CAP + rk) * 2]
                    en = wtab_ref[row, wbase + (sp * R_CAP + rk) * 2 + 1]
                    t_lo = jnp.maximum(st - useg, 0) // WT
                    t_hi = jnp.minimum(
                        (jnp.maximum(en - useg, 0) + WT - 1) // WT, cap)

                    def tile(t, accs, st=st, en=en, useg=useg, dst_s=dst_s,
                             blocks=blocks, gidx=gidx):
                        # per-slot lane offsets are DT-aligned by
                        # construction (cumsum of DT-granular slot sizes)
                        base = pl.multiple_of(dst_s + t * WT, 128)
                        slabs = {name: win[r:r + 1,
                                           pl.ds(base, WT)].reshape(1, WT)
                                 for name, r in window_rows.items()}
                        jg = (useg + t * WT +
                              jax.lax.broadcasted_iota(
                                  jnp.int32, (1, 1, WT), 2))
                        cx = CxDma(blocks, slabs, jg, st, en, gidx, params)
                        out = kern(cx)
                        return tuple(
                            a + jnp.broadcast_to(out[k], (1, HB, WT))
                            for a, k in zip(accs, out_names))

                    return jax.lax.fori_loop(t_lo, t_hi, tile, accs,
                                             unroll=False)

                accs = jax.lax.fori_loop(0, rcnt, row_body, accs,
                                         unroll=False)

            for oref, a in zip(out_refs, accs):
                oref[0:1, g_i:g_i + 1, off - half:off - half + HB] = \
                    jnp.sum(a, axis=2).reshape(1, 1, HB)


def run(kern: Callable, env: DmaPairEnv, slabs: Dict, fields: Dict,
        params: SimParams) -> Dict[str, jnp.ndarray]:
    """Execute a component pair kernel over the DMA engine.

    ``slabs``: window-side per-particle fields, raw (N,) / (N, d) arrays.
    ``fields``: center-side fields (must include 'pos'). Returns per-particle
    outputs merged back into vectors, like pair_exec.run.
    """
    assert "pos" in fields, "fields must include 'pos'"
    G = env.group
    SU = env.su
    SB = B * G
    window = dict(_split(dict(slabs or {})))
    window.update(_split({"pos": fields["pos"]}))
    center = _split(dict(fields))
    n = fields["pos"].shape[0]
    NSB = n // SB

    # one packed (F_pad, N + SU) f32 matrix serves window DMAs and the
    # center-block DMA; center-only fields ride along in the window copies.
    # A name used by both sides shares its row only when it is literally the
    # same array (e.g. the CG solver evaluates the operator at a different
    # center velocity than the slabbed one).
    mat_rows: list = []
    seen: dict = {}
    window_rows: Dict[str, int] = {}
    center_rows: Dict[str, int] = {}

    def row_of(arr):
        key = id(arr)
        if key not in seen:
            seen[key] = len(mat_rows)
            mat_rows.append(jnp.asarray(arr, jnp.float32))
        return seen[key]

    for k in sorted(window):
        window_rows[k] = row_of(window[k])
    for k in sorted(center):
        center_rows[k] = row_of(center[k])
    F_pad = ((len(mat_rows) + 7) // 8) * 8
    mat = jnp.stack(mat_rows, axis=0)
    mat = jnp.pad(mat, ((0, F_pad - len(mat_rows)), (0, SU)))

    out_struct = _probe_shapes(kern, set(window), set(center), params)
    out_names = sorted(out_struct.keys())

    kern_fn = functools.partial(
        _kernel, kern=kern, out_names=out_names, window_rows=window_rows,
        center_rows=center_rows, params=params, F_pad=F_pad, NSB=NSB)

    W = env.wtab.shape[1]
    interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        kern_fn,
        grid=(NSB,),
        in_specs=[
            pl.BlockSpec((8, META_W), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((8, W), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((1, G, B), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * len(out_names),
        out_shape=[jax.ShapeDtypeStruct((NSB, G, B), jnp.float32)
                   for _ in out_names],
        scratch_shapes=[
            pltpu.VMEM((F_pad, SU), jnp.float32),
            pltpu.VMEM((F_pad, SB), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(env.meta_pack, env.wtab, mat)
    return _collect({k: o.reshape(NSB, SB) for k, o in zip(out_names, outs)},
                    n)
