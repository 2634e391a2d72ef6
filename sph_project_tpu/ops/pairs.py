"""Dense blocked pair engine — the TPU-native neighbor iteration.

Motivation (measured on v5e): XLA's per-element gather runs at ~7 ns/element,
so the classic (N, K) neighbor-list formulation costs 45-250 ms per pair pass
at 100k particles. This engine eliminates per-element gathers entirely:

1. Particles stay sorted by flat cell id (z fastest) — the reference's
   counting sort (base_container.py:495-547) made cell-major too.
2. Particles are processed in blocks of ``B`` consecutive (sorted) particles.
   For one particle the 3^dim stencil collapses to ``NS = 3^(dim-1)``
   *contiguous* runs of sorted particles (3 z-cells each); for a block, the
   union of each run over its particles is still one contiguous window.
3. Each block therefore reads ``NS`` windows of ``S`` consecutive particles —
   fetched with `lax.gather(slice_sizes=(S,))`, i.e. NS dynamic slices per
   block (DMA-friendly), not N*K random loads.
4. Pair interactions are masked *dense* (NB, B, NS*S) computations: VPU
   elementwise + reductions, with the |R|^2 cross term available as an MXU
   batched matmul. XLA fuses the per-op chains so the (NB, B, NS*S)
   intermediates never hit HBM.

Windows longer than ``S`` are truncated and counted in ``overflow`` (the
JAX-MD-style protocol: callers re-build with a larger S when it fires), so
dropped pairs are loud, never silent.
"""
from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from flax import struct

from ..core.params import SimParams
from . import neighbors as nblib


class PairEnv(struct.PyTreeNode):
    """Per-step pair-iteration context over cell-sorted particles."""

    starts: jnp.ndarray        # (NB, NS) i32 — window start index per block/segment
    lens: jnp.ndarray          # (NB, NS) i32 — true window length (uncapped)
    pos_slab: jnp.ndarray      # (NB, NS*S, dim) — slab-gathered positions
    jidx: jnp.ndarray          # (NB, NS*S) i32 — global index of each slab column
    valid: jnp.ndarray         # (NB, NS*S) bool — column holds a real particle
    overflow: jnp.ndarray      # () i32 — window entries lost to the S cap
    # pair-dedup data: block windows can overlap once a block spans several
    # (x, y) cell rows, so a neighbor could appear in more than one window.
    # Each window only accepts particles whose row matches its stencil offset
    # relative to the center particle's row — restoring per-pair uniqueness.
    rows: jnp.ndarray          # (N,) i32 — flat (x, y) row id per particle
    row_slab: jnp.ndarray      # (NB, NS*S) i32 — slabbed row ids
    row_off: jnp.ndarray       # (NS*S,) i32 — expected row offset per column
    # outlier bucketing (None when params.pair_slab_big == 0): blocks whose
    # windows exceed S rerun against S_big windows — domain-box wall sheets
    # make a few blocks span huge index gaps (sorted-order discontinuities)
    # and a single global S sized for them would explode every block's cost
    big_ids: jnp.ndarray = None     # (M,) i32 — block ids processed in pass 2
    big_flag: jnp.ndarray = None    # (NB,) bool — pass-1 result invalid
    starts_big: jnp.ndarray = None  # (M, NS) i32
    jidx_big: jnp.ndarray = None    # (M, NS*Sb) i32
    valid_big: jnp.ndarray = None   # (M, NS*Sb) bool
    row_slab_big: jnp.ndarray = None  # (M, NS*Sb) i32
    pos_slab_big: jnp.ndarray = None  # (M, NS*Sb, dim)
    row_off_big: jnp.ndarray = None   # (NS*Sb,) i32
    # sort-kernel repair shortfall folded into ``overflow`` by neighbor_prep
    # (zeroed particle records — corruption, not just missed candidates);
    # kept separately so diagnostics can tell the two apart
    sort_overflow: jnp.ndarray = None
    # incremental-sort crosser-budget component (diagnostics split; the DMA
    # engine's DmaPairEnv carries the same field)
    sort_overflow_inc: jnp.ndarray = None
    # hybrid inc-sort telemetry (see DmaPairEnv)
    sort_crossers: jnp.ndarray = None
    sort_inc_taken: jnp.ndarray = None

    @property
    def nb(self) -> int:
        return self.starts.shape[0]

    @property
    def slab_width(self) -> int:
        return self.jidx.shape[1]


def _block_window_maxima(pos: "np.ndarray", active: "np.ndarray",
                         params: SimParams):
    """Host-side mirror of make_pair_env's window computation in numpy.

    Returns ``(block_max, order)``: the widest stencil window per block of
    ``pair_block`` cell-sorted particles, and the sort permutation (so callers
    can align per-particle masks with the blocks). Shared core of the slab
    estimators below.
    """
    import numpy as np

    n = pos.shape[0]
    dim = pos.shape[1]
    B = params.pair_block
    g = params.grid_num
    nb = n // B
    # bit-match the on-device f32 binning (lattice particles sit exactly on
    # cell boundaries; f64 binning here would disagree with the real sort)
    start_arr = np.asarray(params.domain_start, np.float32)
    q = (pos.astype(np.float32) - start_arr) / np.float32(params.support_radius)
    coords = np.clip(np.floor(q).astype(np.int64), 0, np.asarray(g) - 1)
    if dim == 3:
        flat = (coords[:, 0] * g[1] + coords[:, 1]) * g[2] + coords[:, 2]
        offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    else:
        flat = coords[:, 0] * g[1] + coords[:, 1]
        offsets = [(dx,) for dx in (-1, 0, 1)]
    ncells = int(np.prod(g))
    flat = np.where(active, flat, ncells)
    order = np.argsort(flat, kind="stable")
    cells_sorted = flat[order]
    coords = coords[order]
    cxy = coords[:, :-1]
    cz = coords[:, -1]
    zlo = np.maximum(cz - 1, 0)
    zhi = np.minimum(cz + 1, g[-1] - 1)
    live = cells_sorted < ncells
    block_max = np.ones(nb, np.int64)
    for off in offsets:
        ncxy = cxy + np.asarray(off)
        ok = np.all((ncxy >= 0) & (ncxy < np.asarray(g[:-1])), axis=-1) & live
        row = ncxy[:, 0] * g[1] + ncxy[:, 1] if dim == 3 else ncxy[:, 0]
        lo = np.where(ok, np.searchsorted(cells_sorted, row * g[-1] + zlo), n)
        hi = np.where(ok, np.searchsorted(cells_sorted, row * g[-1] + zhi + 1), 0)
        blo = lo[: nb * B].reshape(nb, B).min(axis=1)
        bhi = hi[: nb * B].reshape(nb, B).max(axis=1)
        block_max = np.maximum(block_max, np.maximum(bhi - blo, 0))
    return block_max, order


def estimate_slab_size(pos: "np.ndarray", active: "np.ndarray",
                       params: SimParams, margin: float = 1.4,
                       round_to: int = 256) -> int:
    """Host-side estimate of the needed window cap S for a particle set.

    Callers add ``margin`` for densification during the run and watch the
    runtime ``overflow`` counter for the rest (the JAX-MD rebuild protocol).
    """
    import numpy as np

    n = pos.shape[0]
    block_max, _ = _block_window_maxima(pos, active, params)

    def rnd(x):
        return max(min(int(np.ceil(x * margin / round_to) * round_to), n),
                   round_to)

    return rnd(float(block_max.max()))


def estimate_slab_sizes(pos: "np.ndarray", active: "np.ndarray",
                        params: SimParams, margin: float = 1.4,
                        round_to: int = 256,
                        output_mask: "np.ndarray" = None):
    """(S_small, S_big) for outlier bucketing: S_small covers all but the
    worst ~1/(2*pair_big_frac) of blocks, S_big covers the max — both over
    blocks that actually produce output (``output_mask`` per particle; pure
    static-wall blocks are exempt from bucketing at runtime too). Returns
    S_big = 0 when one tier suffices."""
    import numpy as np

    n = pos.shape[0]
    B = params.pair_block
    nb = n // B
    block_max, order = _block_window_maxima(pos, active, params)

    if output_mask is not None:
        block_out = output_mask[order][: nb * B].reshape(nb, B).any(axis=1)
        block_max_out = np.where(block_out, block_max, 1)
    else:
        block_out = np.ones(nb, bool)
        block_max_out = block_max

    def rnd(x):
        return max(min(int(np.ceil(x * margin / round_to) * round_to), n),
                   round_to)

    # keep the flagged fraction well under the M = NB/pair_big_frac budget.
    # A scene can start with zero producing blocks (a pure emitter whose
    # fluid all sits above g_upper) — size from the overall max then
    quant = 1.0 - 0.5 / max(params.pair_big_frac, 2)
    if not block_out.any():
        return rnd(float(block_max.max())), 0
    S_small = rnd(float(np.quantile(block_max_out[block_out], quant)))
    # S_big with extra headroom: fluid redistributes during the run and the
    # flagged (output) blocks' windows can grow (thin streams crossing plane
    # gaps are the worst case until the sub-block window engine lands);
    # the overflow counter guards the remainder
    S_big = rnd(float(block_max_out.max()) * 2.5)
    if S_big <= S_small:
        return max(S_small, rnd(float(block_max_out.max()))), 0
    return S_small, S_big


class SlabField(struct.PyTreeNode):
    """A slab-gathered field: pass-1 (small) windows and, when outlier
    bucketing is active, the pass-2 (big) windows of the outlier blocks."""
    small: jnp.ndarray
    big: jnp.ndarray = None


def _slab_gather_1d(field: jnp.ndarray, starts: jnp.ndarray, S: int) -> jnp.ndarray:
    """(N,) field, (NB, NS) starts -> (NB, NS*S) contiguous windows."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(2,), collapsed_slice_dims=(), start_index_map=(0,))
    out = jax.lax.gather(field, starts[..., None], dn, (S,),
                         mode=jax.lax.GatherScatterMode.CLIP)
    nb, ns = starts.shape
    return out.reshape(nb, ns * S)


def slab(env: PairEnv, field: jnp.ndarray) -> jnp.ndarray:
    """Gather a per-particle field into slab layout.

    (N,) -> (NB, NS*S); (N, d) -> (NB, NS*S, d). Invalid columns contain
    clamped garbage — always combine with ``env.valid`` / a pair mask.
    """
    S = env.slab_width // env.starts.shape[1]
    if field.ndim == 1:
        return _slab_gather_1d(field, env.starts, S)
    cols = [_slab_gather_1d(field[:, d], env.starts, S)
            for d in range(field.shape[1])]
    return jnp.stack(cols, axis=-1)


def _gather_field(f, starts, S):
    dt = f.dtype
    if f.ndim == 1:
        g = _slab_gather_1d(f.astype(jnp.float32) if dt != jnp.float32 else f,
                            starts, S)
        return g.astype(dt) if dt != jnp.float32 else g
    cols = [_slab_gather_1d(f[:, d], starts, S) for d in range(f.shape[1])]
    return jnp.stack(cols, axis=-1)


def slab_pack(env, fields: dict) -> dict:
    """Slab-gather many fields (one contiguous-window gather per component).

    Under the DMA engine (env is a :class:`~.pair_dma.DmaPairEnv`) no slabs
    exist — the kernel DMAs windows itself — so the raw fields pass through.

    Measured on v5e: slab gathers cost ~1us per slice regardless of width,
    but packing fields into an (N, F) matrix first costs far more than the
    gathers save (minor-dim interleave writes are pathological on TPU), so
    each component gathers separately from its natural (N,) layout.

    Returns :class:`SlabField` values carrying the pass-2 (outlier) windows
    too when bucketing is active.
    """
    if hasattr(env, "meta_pack") or hasattr(env, "halo"):
        # DmaPairEnv / SpatialEnv: raw fields pass through (windows are
        # fetched by the kernel / extended per pass)
        return dict(fields)
    ns = env.starts.shape[1]
    S = env.slab_width // ns
    res = {}
    for name, f in fields.items():
        small = _gather_field(f, env.starts, S)
        big = None
        if env.big_ids is not None:
            Sb = env.jidx_big.shape[1] // ns
            big = _gather_field(f, env.starts_big, Sb)
        res[name] = SlabField(small=small, big=big)
    return res


def block(field: jnp.ndarray, B: int) -> jnp.ndarray:
    """(N, ...) -> (NB, B, ...) reshape of the block-owned particles."""
    return field.reshape((-1, B) + field.shape[1:])


def unblock(x: jnp.ndarray) -> jnp.ndarray:
    return x.reshape((-1,) + x.shape[2:])


def make_pair_env(pos: jnp.ndarray, cells_sorted: jnp.ndarray,
                  params: SimParams,
                  needs_output: jnp.ndarray | None = None) -> PairEnv:
    """Build the block windows from sorted cell ids.

    Window bounds come from vectorized ``searchsorted`` over the sorted cell
    ids (same machinery as the fixed-K builder, ops/neighbors.py), aggregated
    per block with min/max.
    """
    n, dim = pos.shape
    B = params.pair_block
    S = min(params.pair_slab, n)   # gather slice size cannot exceed operand
    g = params.grid_num
    nb = n // B

    coords = nblib.cell_coords(pos, params)
    if dim == 3:
        offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    else:
        offsets = [(dx,) for dx in (-1, 0, 1)]
    ns = len(offsets)
    off = jnp.asarray(offsets, jnp.int32)                  # (NS, dim-1)

    cxy = coords[:, :-1]                                    # (N, dim-1)
    cz = coords[:, -1]
    ncxy = cxy[:, None, :] + off[None]                      # (N, NS, dim-1)
    lims = jnp.asarray(g[:-1], jnp.int32)
    seg_ok = jnp.all((ncxy >= 0) & (ncxy < lims), axis=-1)  # (N, NS)
    # inactive particles get empty windows — their clamped coords would
    # otherwise stretch tail-block windows across the array. Sentinels
    # (num_cells) sit at the tail; negative ids mark not-received halo slots
    # at the FRONT under spatial decomposition (parallel/spatial.py)
    seg_ok = seg_ok & (cells_sorted < params.num_cells)[:, None] & \
        (cells_sorted >= 0)[:, None]
    zlo = jnp.maximum(cz - 1, 0)
    zhi = jnp.minimum(cz + 1, g[-1] - 1)
    if dim == 3:
        row = ncxy[..., 0] * g[1] + ncxy[..., 1]
    else:
        row = ncxy[..., 0]
    flat_lo = row * g[-1] + zlo[:, None]
    flat_hi = row * g[-1] + zhi[:, None] + 1
    # Cell-offset table instead of searchsorted: a binary search per query
    # costs log(N) random gathers (~120 ms/step at 100k measured); a
    # histogram + cumsum + one table gather is ~20x cheaper.
    ones = jnp.ones_like(cells_sorted, dtype=jnp.int32)
    counts = jax.ops.segment_sum(ones, cells_sorted,
                                 num_segments=params.num_cells + 1)
    # negative ids are dropped from the histogram but still occupy leading
    # array slots; shift the position table past them
    front_invalid = jnp.sum((cells_sorted < 0).astype(jnp.int32))
    table = front_invalid + jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    start = table[jnp.clip(flat_lo, 0, params.num_cells)]
    end = table[jnp.clip(flat_hi, 0, params.num_cells + 1)]
    start = jnp.where(seg_ok, start, n).astype(jnp.int32)
    end = jnp.where(seg_ok, end, 0).astype(jnp.int32)

    # aggregate to blocks: window = [min start, max end) per (block, segment)
    bstart = jnp.min(start.reshape(nb, B, ns), axis=1)      # (NB, NS)
    bend = jnp.max(end.reshape(nb, B, ns), axis=1)
    blen = jnp.maximum(bend - bstart, 0)

    # gather CLIP mode clamps the slice START so the slice fits the operand;
    # pre-clamp ourselves and keep validity relative to the true window (the
    # clamped slab is a superset of the window, so nothing is lost)
    cstart = jnp.clip(jnp.minimum(bstart, n - S), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (nb, ns, S), 2)
    jglobal = cstart[:, :, None] + col                       # (NB, NS, S)
    valid = (jglobal >= bstart[:, :, None]) & \
            (jglobal < jnp.minimum(bend, cstart + S)[:, :, None])
    overflow_per_block = jnp.sum(jnp.maximum(bend - (cstart + S), 0), axis=1)
    overflow = jnp.sum(overflow_per_block)
    jidx = jnp.minimum(jglobal, n - 1).reshape(nb, ns * S)
    valid = valid.reshape(nb, ns * S)
    bstart = cstart

    # row ids + the per-window expected row offset (see PairEnv docstring)
    if dim == 3:
        rows_all = cells_sorted // g[2]
        row_off_seg = off[:, 0] * g[1] + off[:, 1]         # (NS,)
    else:
        rows_all = cells_sorted // g[1]
        row_off_seg = off[:, 0]
    rows_all = jnp.minimum(rows_all, jnp.int32(2 ** 30)).astype(jnp.int32)
    row_off = jnp.repeat(row_off_seg, S).astype(jnp.int32)  # (NS*S,)

    env = PairEnv(starts=bstart, lens=blen, pos_slab=jnp.zeros(()),
                  jidx=jidx, valid=valid, overflow=overflow.astype(jnp.int32),
                  rows=rows_all, row_slab=jnp.zeros(()), row_off=row_off)
    pos_sl = _gather_field(pos, bstart, S)
    rows_sl = _gather_field(rows_all, bstart, S)
    env = env.replace(pos_slab=pos_sl, row_slab=rows_sl)

    Sb = min(params.pair_slab_big, n)
    if Sb > S:
        maxlen = jnp.max(blen, axis=1)                       # (NB,)
        if needs_output is not None:
            # blocks whose rows produce no outputs (e.g. pure static-wall
            # blocks) need no big-window rerun: their clipped pass-1 sums are
            # never read, so truncation is harmless
            maxlen = jnp.where(needs_output, maxlen, 0)
        M = max(1, nb // params.pair_big_frac)
        _, big_ids = jax.lax.top_k(maxlen, M)
        big_ids = big_ids.astype(jnp.int32)
        big_flag = maxlen > S
        # flagged blocks not captured by the M slots => dropped pairs: count
        missed = jnp.sum(big_flag) - jnp.sum(big_flag[big_ids])
        # pass-2 supersedes the flagged blocks' clipped small windows, so
        # their small-side truncation is not a loss
        env = env.replace(overflow=env.overflow -
                          jnp.sum(jnp.where(big_flag,
                                            overflow_per_block, 0)).astype(jnp.int32))
        bstart_b = bstart[big_ids]
        bend_b = (bstart + jnp.maximum(blen, 0))[big_ids]
        # same construction as the small side, at S_big
        cstart_b = jnp.clip(jnp.minimum(bstart_b, n - Sb), 0)
        col_b = jax.lax.broadcasted_iota(jnp.int32, (M, ns, Sb), 2)
        jglob_b = cstart_b[:, :, None] + col_b
        valid_b = (jglob_b >= bstart_b[:, :, None]) & \
                  (jglob_b < jnp.minimum(bend_b, cstart_b + Sb)[:, :, None])
        overflow_b = jnp.sum(jnp.maximum(bend_b - (cstart_b + Sb), 0))
        jidx_b = jnp.minimum(jglob_b, n - 1).reshape(M, ns * Sb)
        valid_b = valid_b.reshape(M, ns * Sb)
        row_off_b = jnp.repeat(row_off_seg, Sb).astype(jnp.int32)
        pos_sb = _gather_field(pos, cstart_b, Sb)
        rows_sb = _gather_field(rows_all, cstart_b, Sb)
        env = env.replace(
            overflow=env.overflow + missed.astype(jnp.int32) * S +
            overflow_b.astype(jnp.int32),
            big_ids=big_ids, big_flag=big_flag, starts_big=cstart_b,
            jidx_big=jidx_b, valid_big=valid_b,
            row_slab_big=rows_sb, pos_slab_big=pos_sb,
            row_off_big=row_off_b,
        )
    return env


# ---------------------------------------------------------------------------
# Pair computation helpers
# ---------------------------------------------------------------------------

def pair_geometry(env: PairEnv, pos: jnp.ndarray, params: SimParams,
                  strict_mask: bool = True,
                  pos_slab: jnp.ndarray | None = None):
    """R = x_i - x_j (NB, B, NS*S, dim), squared distance, and the standard
    pair mask (within support radius, not self, valid column).

    Matches for_all_neighbors' strict ``|R| < dh`` test
    (base_container.py:549-560). Pass a fresh ``pos_slab`` when positions
    moved after the windows were built (the reference reuses its stale grid
    with current positions the same way).
    """
    B = params.pair_block
    if pos_slab is None:
        pos_slab = env.pos_slab
    pb = block(pos, B)                                    # (NB, B, dim)
    R = pb[:, :, None, :] - pos_slab[:, None, :, :]       # (NB, B, W, dim)
    d2 = jnp.sum(R * R, axis=-1)
    n = pos.shape[0]
    i_global = jax.lax.broadcasted_iota(
        jnp.int32, (env.nb, B), 1) + (jnp.arange(env.nb, dtype=jnp.int32) * B)[:, None]
    not_self = env.jidx[:, None, :] != i_global[:, :, None]
    # dedup: the column's row must equal the center's row + window offset
    row_match = env.row_slab[:, None, :] == \
        (block(env.rows, B)[:, :, None] + env.row_off[None, None, :])
    mask = env.valid[:, None, :] & not_self & row_match
    if strict_mask:
        mask = mask & (d2 < params.support_radius ** 2)
    return R, d2, mask


def psum(contrib: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Masked sum over the slab axis -> per-particle (N, ...)."""
    m = mask.reshape(mask.shape + (1,) * (contrib.ndim - mask.ndim))
    return unblock(jnp.sum(jnp.where(m, contrib, 0), axis=2))


# ---------------------------------------------------------------------------
# Chunked execution: bound the live (blocks, B, W) pair tensors
# ---------------------------------------------------------------------------

class BlockCtx(struct.PyTreeNode):
    """A chunk-of-blocks view handed to pair kernels by :func:`run_blocked`.

    All arrays have a leading chunk axis C: pos_block (C, B, dim),
    pos_slab (C, W, dim), jidx/valid/row_slab (C, W), gidx/row_block (C, B).
    ``row_off`` (W,) is shared.
    """

    pos_block: jnp.ndarray
    pos_slab: jnp.ndarray
    jidx: jnp.ndarray
    valid: jnp.ndarray
    row_block: jnp.ndarray
    row_slab: jnp.ndarray
    row_off: jnp.ndarray
    gidx: jnp.ndarray

    def geometry(self, params: SimParams, pos_block=None, pos_slab=None,
                 strict: bool = True):
        """R, d2, and the standard pair mask for this chunk (strict |R| < dh,
        no self, window-valid, row-matched — base_container.py:549-560)."""
        pb = self.pos_block if pos_block is None else pos_block
        ps = self.pos_slab if pos_slab is None else pos_slab
        R = pb[:, :, None, :] - ps[:, None, :, :]
        d2 = jnp.sum(R * R, axis=-1)
        not_self = self.jidx[:, None, :] != self.gidx[:, :, None]
        row_match = self.row_slab[:, None, :] == \
            (self.row_block[:, :, None] + self.row_off[None, None, :])
        mask = self.valid[:, None, :] & not_self & row_match
        if strict:
            mask = mask & (d2 < params.support_radius ** 2)
        return R, d2, mask

    @staticmethod
    def sum_w(contrib: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        """Masked reduction over the slab axis -> (C, B, ...)."""
        m = mask.reshape(mask.shape + (1,) * (contrib.ndim - mask.ndim))
        return jnp.sum(jnp.where(m, contrib, 0), axis=2)


def _largest_divisor_leq(n: int, k: int) -> int:
    for c in range(min(n, k), 0, -1):
        if n % c == 0:
            return c
    return 1


def run_blocked(kernel, env: PairEnv, slabs: dict, fields: dict,
                params: SimParams, extra_slabs: dict | None = None):
    """Map ``kernel(ctx, slabs_chunk, fields_chunk)`` over chunks of blocks.

    Without chunking, XLA materializes every multi-consumer (NB, B, W) pair
    tensor in HBM (measured: 5.5 GB each at 100k particles). ``lax.map`` over
    chunks of ``params.pair_chunk`` blocks bounds the live set to the chunk
    while keeping full fusion inside it.

    - slabs: dict of (NB, W[, d]) slab arrays (from slab / slab_pack)
    - fields: dict of per-particle (N[, d]) arrays — blocked to (NB, B[, d])
    - kernel returns a pytree of (C, B, ...) arrays -> concatenated to (N, ...)
      (scalars (C,) are reduced by summation -> ())
    """
    B = params.pair_block
    NB = env.nb
    c = _largest_divisor_leq(NB, params.pair_chunk)
    nchunks = NB // c

    def resh(x):
        return x.reshape((nchunks, c) + x.shape[1:])

    assert "pos" in fields, "fields must include 'pos' (center positions)"
    n = env.rows.shape[0]
    gidx = jnp.arange(n, dtype=jnp.int32).reshape(NB, B)
    if extra_slabs:
        slabs = dict(slabs, **extra_slabs)
    ctx_arrays = dict(
        pos_slab=resh(env.pos_slab), jidx=resh(env.jidx),
        valid=resh(env.valid), row_block=resh(block(env.rows, B)),
        row_slab=resh(env.row_slab), gidx=resh(gidx))
    fields_b = {k: resh(block(v, B)) for k, v in fields.items()}
    slabs_r = {k: resh(v) for k, v in (slabs or {}).items()}

    def body(args):
        ctxa, sl_c, f_c = args
        ctx = BlockCtx(pos_block=f_c["pos"], pos_slab=ctxa["pos_slab"],
                       jidx=ctxa["jidx"], valid=ctxa["valid"],
                       row_block=ctxa["row_block"], row_slab=ctxa["row_slab"],
                       row_off=env.row_off, gidx=ctxa["gidx"])
        return kernel(ctx, sl_c, f_c)

    outs = jax.lax.map(body, (ctx_arrays, slabs_r, fields_b))

    def collect(y):
        if y.ndim >= 3 and y.shape[1] == c and y.shape[2] == B:
            return y.reshape((NB * B,) + y.shape[3:])
        return jnp.sum(y, axis=0)      # chunk-level scalars
    return jax.tree.map(collect, outs)
