"""TPU-native neighbor search: sort-by-cell + fixed-capacity neighbor lists.

The reference uses a Taichi uniform grid with an atomic histogram + prefix-sum
counting sort and a dynamic 27-cell iteration per particle
(``base_container.py:495-560``). That design relies on per-thread dynamic
loops and atomics, which do not map to the TPU. Here instead:

1.  Particles get a flat cell id (same x-major/z-fastest layout as
    ``flatten_grid_index``, base_container.py:472-481) and are reordered by a
    stable XLA sort once per step — the analogue of the counting sort, and it
    gives the same cell-major memory locality.
2.  Because the z axis is fastest in the flat id, the 3x3x3 stencil collapses
    to **9 contiguous segments** of sorted particles (3 z-cells each). Segment
    bounds come from vectorized ``searchsorted`` — no per-cell histogram table
    is materialized, so giant mostly-empty grids cost nothing.
3.  Candidates are compacted into a fixed-K neighbor list (built once per
    step, reused by every pair pass of every solver iteration — 10-30x reuse).
    Overflow of the per-segment cap or of K is counted and reported in
    diagnostics instead of silently dropping physics.

All shapes are static; the build is chunked over particles to bound the
(S, 9, 3C) candidate intermediates.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core.params import SimParams
from . import kernels


class Neighbors(struct.PyTreeNode):
    """Fixed-capacity neighbor lists over the *sorted* particle order."""

    idx: jnp.ndarray            # (N, K) i32 — neighbor index; == self when invalid
    count: jnp.ndarray          # (N,) i32 — valid neighbors per particle
    cell_overflow: jnp.ndarray  # () i32 — candidates lost to the segment cap
    k_overflow: jnp.ndarray     # () i32 — true neighbors lost to K

    @property
    def mask(self) -> jnp.ndarray:
        """(N, K) bool validity mask (recomputed on the fly; fuses for free)."""
        k = self.idx.shape[1]
        return jax.lax.broadcasted_iota(jnp.int32, self.idx.shape, 1) < self.count[:, None]


class PairGeometry(struct.PyTreeNode):
    """Per-pair geometry cached once per step (positions are frozen during
    the solver iterations of every method, so this is safe to reuse)."""

    R: jnp.ndarray        # (N, K, dim) — pos_i - pos_j
    dist: jnp.ndarray     # (N, K)
    W: jnp.ndarray        # (N, K) — cubic W(|R|), zeroed where invalid
    gradW: jnp.ndarray    # (N, K, dim) — ∇W, zeroed where invalid


def cell_coords(pos: jnp.ndarray, params: SimParams) -> jnp.ndarray:
    """Integer cell coordinates, clamped into the grid.

    The quotient is sandwiched between ``optimization_barrier``s so the
    binning arithmetic cannot fuse with its producers OR consumers: fused
    contexts compile (pos - start) / h to different fma/mul+add sequences
    whose f32 results differ in the last ulp — and a perfect lattice puts
    many particles exactly on cell edges, where one ulp flips floor() by a
    whole cell. Measured round 4: prepare()'s program and the step's
    program disagreed on ~712k of 1.23M lattice particles. NOTE the
    barriers only make binning deterministic WITHIN a program family that
    codegens the isolated fusion identically; cross-PROGRAM consumers (the
    incremental sort comparing against prepare()'s layout) must not rely
    on bit-equality at all — see make_dma_env(keep_layout=False)."""
    start = jnp.asarray(params.domain_start, jnp.float32)
    q = jax.lax.optimization_barrier(
        (jax.lax.optimization_barrier(pos) - start)
        / jnp.float32(params.support_radius))
    coords = jnp.floor(q).astype(jnp.int32)
    hi = jnp.asarray(params.grid_num, jnp.int32) - 1
    return jnp.clip(coords, 0, hi)


def flat_cell_ids(pos: jnp.ndarray, active: jnp.ndarray, params: SimParams) -> jnp.ndarray:
    """Flat cell id per particle; inactive particles get the sentinel id
    ``num_cells`` so the sort moves them to the tail and no cell range ever
    includes them."""
    c = cell_coords(pos, params)
    g = params.grid_num
    if params.dim == 3:
        flat = (c[:, 0] * g[1] + c[:, 1]) * g[2] + c[:, 2]
    else:
        flat = c[:, 0] * g[1] + c[:, 1]
    return jnp.where(active, flat, params.num_cells)


def sort_permutation(cells: jnp.ndarray) -> jnp.ndarray:
    """Stable permutation ordering particles by cell id (the counting-sort
    analogue; reference reorder_particles is also stable)."""
    return jnp.argsort(cells, stable=True)


PLANE_PAD = 64   # == pair_dma.B; plane runs padded so sub-blocks never cross


def plane_padded_permutation(cells: jnp.ndarray, params: SimParams,
                             return_cells: bool = False):
    """Gather indices for the plane-padded cell sort (the DMA pair engine's
    layout): particles are cell-sorted, but each x-plane's run is padded to a
    multiple of ``PLANE_PAD`` with dead slots, so no 64-particle sub-block
    ever crosses an x-plane. Crossing blocks otherwise get degenerate
    rectangle hulls (their y-hull spans the whole fluid), which is what makes
    plain blocked layouts unusable for plane-relative windows.

    The permutation is a BIJECTION: live particles take the plane-padded
    slots; inactive (sentinel-celled) records — including future entryTime
    particles, whose data must survive — fill the leftover slots (the
    plane-end pad gaps and the tail) in index order. Pad-gap slots therefore
    hold inactive records, which the env builder's live mask and occurrence
    tables already exclude from every window.

    Built from SCANS, not per-plane tables: each n-sized scatter / gather /
    segment_sum on TPU costs 10-18 ms at 2M particles (scatter_bench_r4e),
    and the original table build chained ~9 of them (114 ms — 19x the 6 ms
    argsort it decorates). Here the padded slot of a live record is
    ``sorted_rank + cum_pad_of_earlier_planes``, with the cumulative pad
    computed by one cummax (plane starts) + one cumsum (pad contributions),
    and the dead-record fill needs only one scatter + one cumsum + one
    gather. 3 chained n-primitives instead of ~9.

    With ``return_cells=True`` also returns the permuted cell ids
    (``cells[perm]``, bit-identical) assembled from one extra scatter —
    cheaper than the caller's separate n-gather.
    """
    n = cells.shape[0]
    g = params.grid_num
    plane_stride = 1
    for s in g[1:]:
        plane_stride *= s
    gx = g[0]
    ncells = params.num_cells
    i32 = jnp.int32
    k = jnp.arange(n, dtype=i32)
    # one stable sort yields BOTH the order and the sorted keys (argsort
    # would throw the keys away and force an n-gather to recover them)
    cs, order = jax.lax.sort((cells, k), is_stable=True, num_keys=1)
    live = cs < ncells
    pl_id = jnp.where(live, cs // plane_stride, gx)
    # record space: plane starts, each contributing the PREVIOUS plane's
    # pad to the cumulative slot shift (empty planes pad to 0 — absent
    # from the sorted order, absent from the sum)
    prev_pl = jnp.concatenate([jnp.full((1,), -1, pl_id.dtype), pl_id[:-1]])
    is_start = pl_id != prev_pl
    plane_start = jax.lax.cummax(jnp.where(is_start, k, 0))
    start_prev = jnp.concatenate([jnp.zeros((1,), i32), plane_start[:-1]])
    count_prev = k - start_prev            # prev plane's size, valid at starts
    pad_prev = (-count_prev) % PLANE_PAD
    shift = jnp.cumsum(jnp.where(is_start & (k > 0), pad_prev, 0))
    out_live = jnp.minimum(k + shift, n - 1)  # safety (n_pad plane budget)
    # slot space: live records scatter their id; dead records fill the
    # complement (pad gaps + tail) in index order — stable sort already has
    # them index-ascending at the sorted tail
    val = jnp.zeros((n,), i32).at[
        jnp.where(live, out_live, n)].set(order + 1, mode="drop")
    occupied = val > 0
    nfree = (~occupied).astype(i32)
    free_rank = jnp.cumsum(nfree) - nfree
    n_live = jnp.sum(live.astype(i32))
    dead_src = order[jnp.minimum(n_live + free_rank, n - 1)]
    perm = jnp.where(occupied, val - 1, dead_src)
    if not return_cells:
        return perm
    cells_sorted = jnp.full((n,), ncells, cells.dtype).at[
        jnp.where(live, out_live, n)].set(cs, mode="drop")
    return perm, cells_sorted


def inc_sort_budget(n: int, params: SimParams) -> int:
    """Static crosser budget of the incremental sort (K below).

    ``params.sort_inc_budget`` overrides (tests force the hybrid's full-sort
    branch with a tiny budget; tuning can shrink the K-sized mover sort once
    hardware crosser counts at settled state are known)."""
    if params.sort_inc_budget:
        return int(params.sort_inc_budget)
    return max(4096, n // 4)


def crosser_counts(cells_new: jnp.ndarray, cells_old: jnp.ndarray,
                   params: SimParams):
    """(n_mov, n_lv): how many records the incremental permutation would
    have to move — EXACTLY the counts its compact() sees. sort_state's
    hybrid uses these as the lax.cond predicate: the incremental branch is
    entered only when both fit the static budget, so its record-zeroing
    overflow mode is structurally unreachable (the coherent fall, where a
    whole body crosses a z-cell in the same step and movers ~= n_fluid,
    takes the full-sort branch instead)."""
    ncells = params.num_cells
    live_n = cells_new < ncells
    live_o = cells_old < ncells
    stay = live_n & (cells_new == cells_old)
    n_mov = jnp.sum(live_n & ~stay).astype(jnp.int32)
    n_lv = jnp.sum(live_o & (cells_new != cells_old)).astype(jnp.int32)
    return n_mov, n_lv


def incremental_plane_padded_permutation(
        cells_new: jnp.ndarray, cells_old: jnp.ndarray,
        t_start: jnp.ndarray, t_end: jnp.ndarray, params: SimParams):
    """plane_padded_permutation without the full stable argsort, exploiting
    that the state is already cell-sorted from the previous step: only
    CELL-CROSSERS move, and their per-cell ranks come from one small sort.

    ``cells_new``: this step's cell ids in current slot order. ``cells_old``:
    the ids the current layout was sorted by (stored in the previous env,
    NOT recomputed from positions — see sort_state's fusion-rounding note).
    ``t_start``/``t_end``: the previous env's occurrence tables over
    ``cells_old`` (backfilled; count(c) = max(end-start, 0) is exact because
    pad gaps only sit between plane runs, never inside a cell's range).

    New intra-cell order is DETERMINISTIC but not the stable-argsort order:
    stayers first (old slot order), then arrivals (old slot order). Windows
    only need grouping by cell, so physics is exact either way.

    Returns (perm, overflow): overflow counts crossers beyond the static
    n//4 budget — the layout is then degraded (particles placed at clamped
    slots), surfaced loudly like every other engine cap.
    """
    n = cells_new.shape[0]
    ncells = params.num_cells
    g = params.grid_num
    plane_stride = 1
    for s in g[1:]:
        plane_stride *= s
    gx = g[0]
    K = inc_sort_budget(n, params)
    i32 = jnp.int32
    idx = jnp.arange(n, dtype=i32)

    live_n = cells_new < ncells
    live_o = cells_old < ncells
    stay = live_n & (cells_new == cells_old)
    mover = live_n & ~stay
    leaver = live_o & (cells_new != cells_old)

    def compact(mask):
        r = (jnp.cumsum(mask) - mask).astype(i32)
        total = r[-1] + mask[-1].astype(i32)
        slots = jnp.full((K,), n, i32).at[
            jnp.where(mask, r, K)].set(idx, mode="drop")
        return slots, total

    mov_slot, n_mov = compact(mover)
    lv_slot, n_lv = compact(leaver)
    ovf = jnp.maximum(n_mov - K, 0) + jnp.maximum(n_lv - K, 0)

    mov_cell = jnp.where(mov_slot < n,
                         cells_new[jnp.minimum(mov_slot, n - 1)], ncells)
    lv_cell = jnp.where(lv_slot < n,
                        cells_old[jnp.minimum(lv_slot, n - 1)], ncells)

    count_old = jnp.maximum(t_end[:ncells] - t_start[:ncells], 0)
    arr_hist = jnp.zeros((ncells,), i32).at[mov_cell].add(1, mode="drop")
    lv_hist = jnp.zeros((ncells,), i32).at[lv_cell].add(1, mode="drop")
    stay_hist = count_old - lv_hist
    live_hist = stay_hist + arr_hist

    cum_arr_in = jnp.cumsum(arr_hist)
    cum_arr_ex = cum_arr_in - arr_hist
    cum_stay_in = jnp.cumsum(stay_hist)

    # plane padding bases (cells of one x-plane are contiguous in flat id)
    pl_counts = live_hist.reshape(gx, plane_stride).sum(axis=1)
    padded = (pl_counts + PLANE_PAD - 1) // PLANE_PAD * PLANE_PAD
    cump = jnp.cumsum(padded)
    base_pad = cump - padded
    cum_live = jnp.cumsum(pl_counts)
    live_ex = cum_live - pl_counts
    adj = (base_pad - live_ex).astype(i32)   # slot = live_rank + adj[plane]

    # stayers: the old live order is ascending in cell id, so the global
    # stayer prefix IS cum_stay_excl(cell) + within-cell stable rank
    scum = (jnp.cumsum(stay) - stay).astype(i32)
    cn = jnp.minimum(cells_new, ncells - 1)
    rank_stay = scum + cum_arr_ex[cn]
    out_stay = jnp.minimum(rank_stay + adj[cn // plane_stride], n - 1)

    # movers: one K-sized stable sort by target cell; position in the
    # sorted list already equals cum_arr_excl(cell) + within-cell rank
    mseq = jnp.argsort(mov_cell, stable=True)
    mc_s = mov_cell[mseq]
    ms_s = mov_slot[mseq]
    mc = jnp.minimum(mc_s, ncells - 1)
    rank_mov = cum_stay_in[mc] + jnp.arange(K, dtype=i32)
    out_mov = jnp.where(mc_s < ncells,
                        jnp.minimum(rank_mov + adj[mc // plane_stride],
                                    n - 1), n)

    # dead records absorb the free slots (pad gaps + tail) in slot order
    occupied = jnp.zeros((n,), i32).at[
        jnp.where(stay, out_stay, n)].set(1, mode="drop")
    occupied = occupied.at[out_mov].set(1, mode="drop")
    nfree = 1 - occupied
    free_rank = (jnp.cumsum(nfree) - nfree).astype(i32)
    free = jnp.zeros((n,), i32).at[
        jnp.where(occupied == 1, n, free_rank)].set(idx, mode="drop")
    dead = ~live_n
    dcum = (jnp.cumsum(dead) - dead).astype(i32)
    out_dead = free[jnp.minimum(dcum, n - 1)]

    out_pos = jnp.where(stay, out_stay, jnp.where(dead, out_dead, n))
    perm = jnp.zeros((n,), i32).at[out_pos].set(idx, mode="drop")
    perm = perm.at[out_mov].set(ms_s, mode="drop")
    return perm, ovf.astype(jnp.int32)


def build_neighbors(pos: jnp.ndarray, cells_sorted: jnp.ndarray,
                    params: SimParams) -> Neighbors:
    """Build the (N, K) neighbor list from cell-sorted positions.

    ``cells_sorted`` must be ascending (output of the sort step). Candidates
    for particle i are the 9 (3D) / 3 (2D) contiguous sorted segments covering
    the 3^dim stencil; they are distance-filtered (strict ``< dh``, matching
    for_all_neighbors, base_container.py:559) and compacted to K.
    """
    n, dim = pos.shape
    K = params.neighbor_cap
    seg_len = 3 * params.cell_cap  # candidates kept per contiguous segment
    g = params.grid_num
    dh2 = params.support_radius * params.support_radius

    if dim == 3:
        offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    else:
        offsets = [(dx,) for dx in (-1, 0, 1)]
    n_seg = len(offsets)
    offsets = jnp.asarray(offsets, jnp.int32)  # (n_seg, dim-1)

    S = min(params.build_chunk, n)
    while n % S != 0:  # n is padded to 1024 so small S divides it
        S //= 2
    n_chunks = n // S

    coords_all = cell_coords(pos, params)
    active_all = cells_sorted < params.num_cells

    def chunk_body(carry, chunk):
        base, coords, active = chunk
        # --- segment bounds -------------------------------------------------
        cxy = coords[:, :-1]                       # (S, dim-1)
        cz = coords[:, -1]                         # (S,)
        ncxy = cxy[:, None, :] + offsets[None]     # (S, n_seg, dim-1)
        lims = jnp.asarray(g[:-1], jnp.int32)
        seg_ok = jnp.all((ncxy >= 0) & (ncxy < lims), axis=-1)  # (S, n_seg)
        zlo = jnp.maximum(cz - 1, 0)
        zhi = jnp.minimum(cz + 1, g[-1] - 1)
        if dim == 3:
            row = ncxy[..., 0] * g[1] + ncxy[..., 1]
        else:
            row = ncxy[..., 0]
        flat_lo = row * g[-1] + zlo[:, None]
        flat_hi = row * g[-1] + zhi[:, None] + 1
        start = jnp.searchsorted(cells_sorted, flat_lo.reshape(-1)).reshape(flat_lo.shape)
        end = jnp.searchsorted(cells_sorted, flat_hi.reshape(-1)).reshape(flat_hi.shape)
        raw_cnt = jnp.where(seg_ok, end - start, 0)
        cnt = jnp.minimum(raw_cnt, seg_len)
        cell_of = jnp.sum(raw_cnt - cnt)

        # --- candidate enumeration -----------------------------------------
        slot = jnp.arange(seg_len, dtype=jnp.int32)
        cand = start[:, :, None] + slot[None, None, :]          # (S, n_seg, L)
        cvalid = slot[None, None, :] < cnt[:, :, None]
        cand = cand.reshape(S, -1)
        cvalid = cvalid.reshape(S, -1)
        self_idx = base + jnp.arange(S, dtype=jnp.int32)
        safe = jnp.where(cvalid, cand, 0)
        cpos = pos[safe]                                        # (S, M, dim)
        d2 = jnp.sum((pos[self_idx][:, None, :] - cpos) ** 2, axis=-1)
        cvalid &= (d2 < dh2) & (cand != self_idx[:, None]) & active[:, None]

        # --- compaction to K -------------------------------------------------
        kpos = jnp.cumsum(cvalid, axis=1) - 1
        keep = cvalid & (kpos < K)
        k_of = jnp.sum(cvalid) - jnp.sum(keep)
        rows = jnp.broadcast_to(jnp.arange(S)[:, None], cand.shape)
        cols = jnp.where(keep, kpos, K)
        out = jnp.broadcast_to(self_idx[:, None], (S, K + 1))
        out = out.at[rows, cols].set(jnp.where(keep, cand, self_idx[:, None]))
        count = jnp.sum(keep, axis=1).astype(jnp.int32)
        return (carry[0] + cell_of, carry[1] + k_of), (out[:, :K], count)

    bases = jnp.arange(n_chunks, dtype=jnp.int32) * S
    coords_c = coords_all.reshape(n_chunks, S, dim)
    active_c = active_all.reshape(n_chunks, S)
    (cell_of, k_of), (idx, count) = jax.lax.scan(
        chunk_body, (jnp.int32(0), jnp.int32(0)), (bases, coords_c, active_c))
    return Neighbors(
        idx=idx.reshape(n, K),
        count=count.reshape(n),
        cell_overflow=cell_of,
        k_overflow=k_of,
    )


def build_neighbors_bruteforce(pos: jnp.ndarray, active: jnp.ndarray,
                               params: SimParams) -> Neighbors:
    """O(N^2) reference implementation for tests."""
    n = pos.shape[0]
    K = params.neighbor_cap
    dh2 = params.support_radius ** 2
    d2 = jnp.sum((pos[:, None, :] - pos[None, :, :]) ** 2, axis=-1)
    eye = jnp.eye(n, dtype=bool)
    valid = (d2 < dh2) & ~eye & active[None, :] & active[:, None]
    kpos = jnp.cumsum(valid, axis=1) - 1
    keep = valid & (kpos < K)
    self_idx = jnp.arange(n, dtype=jnp.int32)
    rows = jnp.broadcast_to(self_idx[:, None], (n, n))
    cols = jnp.where(keep, kpos, K)
    cand = jnp.broadcast_to(self_idx[None, :], (n, n))
    out = jnp.broadcast_to(self_idx[:, None], (n, K + 1))
    out = out.at[rows, cols].set(jnp.where(keep, cand, self_idx[:, None]))
    return Neighbors(
        idx=out[:, :K],
        count=jnp.sum(keep, axis=1).astype(jnp.int32),
        cell_overflow=jnp.int32(0),
        k_overflow=jnp.int32(jnp.sum(valid) - jnp.sum(keep)),
    )


def pair_geometry(pos: jnp.ndarray, nbrs: Neighbors, params: SimParams) -> PairGeometry:
    """Cache R, |R|, W, ∇W for every neighbor pair (invalid slots zeroed)."""
    R = pos[:, None, :] - pos[nbrs.idx]
    dist = jnp.linalg.norm(R, axis=-1)
    m = nbrs.mask
    W = jnp.where(m, kernels.cubic_W(dist, params.support_radius, params.dim), 0.0)
    gradW = jnp.where(m[..., None],
                      kernels.cubic_grad_W(R, params.support_radius, params.dim, dist),
                      0.0)
    return PairGeometry(R=R, dist=dist, W=W, gradW=gradW)


def gather(nbrs: Neighbors, field: jnp.ndarray) -> jnp.ndarray:
    """Gather a per-particle field to (N, K[, ...]) neighbor layout."""
    return field[nbrs.idx]
