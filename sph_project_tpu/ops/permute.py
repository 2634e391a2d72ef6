"""Fast cell-sort permutation of all per-particle fields (TPU Pallas).

The state stays cell-sorted across steps, so each step's new sort permutation
is NEAR-IDENTITY: most particles keep their slot, cell-crossers move by a few
rows. XLA's gather can't exploit that (measured 134 ms for the ~21 field
gathers at 405k on v5e — the single largest step cost after the pair-engine
rewrite); this kernel can:

- all fields pack into one (F, N) f32 matrix (i32 fields ride as exact f32);
- each output block of 128 slots DMAs the contiguous source span
  [min perm, max perm] of its block in 512-wide tiles;
- a one-hot (tile, 128) matrix ``oh[w, c] = (tile_base + w == perm[c])``
  turns the permutation into an MXU matmul ``(F, tile) @ (tile, 128)``.

The matmul is BITEXACT: each output column sums exactly one ``v * 1.0``
product (exact even through the MXU's bf16x3 f32 path) plus zeros. Blocks
whose span blows up (an x-plane crosser) just run more tiles — slower, never
wrong.
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pair_exec import _split, _collect

OB = 128      # output block (lanes)
PT = 512      # DMA tile width
SU = 4096     # VMEM span budget per block
E_FAR = 4     # far source tiles per block (plane-crosser clusters)
# Sparse-fix budget for the residual stragglers. 2048 covered typical
# settled steps, but LONG horizons burst past it: the r5f 2000-step
# headline settle accumulated overflow from step ~950 even at full
# quiescence (vel_max 7.6 — plane-granule cascades scatter sources into
# more far clusters than E_FAR covers), and adaptive-warm ejection bursts
# reached ~10k uncovered in a step. The fix is a gather+scatter of
# k_fix rows (~7 ns/element), so 4x headroom costs ~1-2 ms/step at 1.97M
# against a correctness cliff (uncovered slots beyond the budget are
# ZEROED records, counted loud in overflow).
K_FIX = 8192


def _kernel(meta_ref, perm_ref, fmat, *out_refs, win, sem, F_pad):
    b = pl.program_id(0)
    row = jax.lax.rem(b, 8)
    wstart = meta_ref[row, 0]
    ntiles = meta_ref[row, 1]
    nfar = meta_ref[row, 2]
    perm_b = perm_ref[0, 0, :].reshape(1, OB)               # (1, OB) i32

    def issue(t, _):
        src = pl.multiple_of(wstart + t * PT, 128)
        dst = pl.multiple_of(t * PT, 128)
        pltpu.make_async_copy(fmat.at[:, pl.ds(src, PT)],
                              win.at[:, pl.ds(dst, PT)], sem).start()
        return 0
    jax.lax.fori_loop(0, ntiles, issue, 0, unroll=False)

    # far tiles: extra source tiles covering this block's out-of-span
    # sources (x-plane crossers jump ~a plane run but cluster into a couple
    # of far regions); they land after the span tiles in win
    def issue_far(e, _):
        src = pl.multiple_of(meta_ref[row, 8 + e], 128)
        dst = pl.multiple_of((ntiles + e) * PT, 128)
        pltpu.make_async_copy(fmat.at[:, pl.ds(src, PT)],
                              win.at[:, pl.ds(dst, PT)], sem).start()
        return 0
    jax.lax.fori_loop(0, nfar, issue_far, 0, unroll=False)

    def wait(t, _):
        pltpu.make_async_copy(fmat.at[:, pl.ds(0, PT)],
                              win.at[:, pl.ds(0, PT)], sem).wait()
        return 0
    jax.lax.fori_loop(0, ntiles + nfar, wait, 0, unroll=False)

    def onehot_acc(base_src, base_dst, acc, excl_span):
        w = win[:, pl.ds(base_dst, PT)]                      # (F_pad, PT)
        idx = (base_src +
               jax.lax.broadcasted_iota(jnp.int32, (PT, 1), 0))
        oh = idx == perm_b                                   # (PT, OB)
        if excl_span:
            # a far tile may overlap the span; only its out-of-span part
            # belongs to it (the span tiles already covered the rest)
            oh = oh & ((idx < wstart) | (idx >= wstart + ntiles * PT))
        # precision=HIGHEST is load-bearing: the MXU's default bf16 path
        # silently rounds every carried field to bf16 (measured: carried
        # positions off by ~0.4% on v5e); the bf16x3 HIGHEST path is exact
        # for one-hot x f32 products
        return acc + jax.lax.dot_general(
            w, oh.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

    def tile(t, acc):
        return onehot_acc(wstart + t * PT, pl.multiple_of(t * PT, 128),
                          acc, False)

    acc = jax.lax.fori_loop(0, ntiles, tile,
                            jnp.zeros((F_pad, OB), jnp.float32),
                            unroll=False)

    def far_tile(e, acc):
        return onehot_acc(meta_ref[row, 8 + e],
                          pl.multiple_of((ntiles + e) * PT, 128), acc, True)

    acc = jax.lax.fori_loop(0, nfar, far_tile, acc, unroll=False)
    for f, oref in enumerate(out_refs):
        oref[pl.ds(0, 1), pl.ds(0, 1), :] = acc[f:f + 1, :].reshape(1, 1, OB)


def permute_fields(perm: jnp.ndarray, arrays: Dict[str, jnp.ndarray],
                   interpret: bool | None = None,
                   k_fix: int = K_FIX) -> Dict[str, jnp.ndarray]:
    """Return ``{k: v[perm] for k, v in arrays}`` via the one-hot kernel.

    Arrays may be (N,) f32/i32 or (N, d); N must be a multiple of 128.

    ``k_fix`` sizes the sparse-fix budget for slots outside the span + far
    tiles. The default covers the stable-argsort layout (measured < 2048
    uncovered at 1.96M); the incremental-sort layout places cell arrivals
    after stayers, shifting slightly more slots per step (measured ~2400
    uncovered at the 1.23M headline scene — overflowed the default and
    zeroed records), so its caller passes a doubled budget.
    """
    n = perm.shape[0]
    assert n % OB == 0
    NB = n // OB

    comps = _split(dict(arrays))
    names = sorted(comps)
    F_pad = ((len(names) + 7) // 8) * 8
    mat = jnp.stack([comps[k].astype(jnp.float32) for k in names], axis=0)
    mat = jnp.pad(mat, ((0, F_pad - len(names)), (0, SU)))

    # per-block source span, with outliers CLAMPED out: a single particle
    # crossing an x-plane jumps ~a plane's worth of slots and would otherwise
    # blow the span (and the old any-uncovered full-gather fallback fired
    # every step — measured 230 ms at 405k). Out-of-span slots are repaired
    # exactly by the sparse pass below.
    pb = perm.reshape(NB, OB)
    base = (jnp.arange(NB, dtype=jnp.int32) * OB)[:, None]
    reach = SU - PT
    pc = jnp.clip(pb, base - reach, base + reach)
    wstart = (jnp.min(pc, axis=1) & ~127).astype(jnp.int32)
    wstart = jnp.maximum(wstart, 0)
    wend = jnp.max(pc, axis=1) + 1
    ntiles = ((wend - wstart + PT - 1) // PT).astype(jnp.int32)
    capped = jnp.clip(ntiles, 0, SU // PT)

    # far tiles: x-plane crossers (10-16k/step in settled flows at 405k)
    # jump ~a plane run beyond the span, but cluster into a couple of far
    # source regions per block; the kernel covers up to E_FAR extra 512-wide
    # source tiles so the sparse scatter fix only handles stragglers
    # (TPU scatters cost ~0.2-1us per updated row — 32k-slot fixes measured
    # ~80 ms/step)
    big32 = jnp.int32(1 << 30)
    cov_span = (pb >= wstart[:, None]) &         (pb < (wstart + capped * PT)[:, None])
    tid = pb // PT
    tid_unc = jnp.where(cov_span, big32, tid)
    tsorted = jnp.sort(tid_unc, axis=1)
    firsts = jnp.concatenate(
        [jnp.ones((NB, 1), bool), tsorted[:, 1:] != tsorted[:, :-1]], axis=1)
    drank = jnp.cumsum(firsts.astype(jnp.int32), axis=1) - 1
    far = jnp.stack([
        jnp.min(jnp.where(firsts & (drank == e), tsorted, big32), axis=1)
        for e in range(E_FAR)], axis=1)                     # (NB, E)
    nfar = jnp.sum(far < big32, axis=1).astype(jnp.int32)
    cov_far = jnp.any(tid[:, :, None] == far[:, None, :], axis=2)
    covered = (cov_span | cov_far).reshape(-1)

    nb_pad = ((NB + 7) // 8) * 8
    meta = jnp.zeros((nb_pad, 128), jnp.int32)
    meta = meta.at[:NB, 0].set(wstart)
    meta = meta.at[:NB, 1].set(capped)
    meta = meta.at[:NB, 2].set(nfar)
    meta = meta.at[:NB, 8:8 + E_FAR].set(
        jnp.where(far < big32, far * PT, 0).astype(jnp.int32))

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    outs = pl.pallas_call(
        lambda meta_ref, perm_ref, fmat, *out_refs: _kernel(
            meta_ref, perm_ref, fmat, *out_refs[:-2],
            win=out_refs[-2], sem=out_refs[-1], F_pad=F_pad),
        grid=(NB,),
        in_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, OB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((1, 1, OB), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)] * len(names),
        out_shape=[jax.ShapeDtypeStruct((NB, 1, OB), jnp.float32)
                   for _ in names],
        scratch_shapes=[
            pltpu.VMEM((F_pad, SU + E_FAR * PT), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        interpret=interpret,
    )(meta, perm.reshape(NB, 1, OB).astype(jnp.int32), mat)

    out = {k: o.reshape(n) for k, o in zip(names, outs)}

    # sparse exact fix, UNCONDITIONAL: slots whose source fell outside the
    # span AND the far tiles (residual stragglers). A lax.cond fallback here
    # measured 104 ms/step on v5e — a conditional in the middle of the step
    # poisons XLA's whole schedule — so exactness beyond K_FIX is the
    # CALLER's contract: shuffles bigger than the combined coverage (a fresh
    # state's first sort, huge entry bursts) must use the exact gather path
    # (sim.sort_state use_kernel=False / params.sort_kernel), and the
    # returned overflow count makes any violation loud.
    unc = (~covered).astype(jnp.int32)
    n_unc = jnp.sum(unc)
    # rank-compaction of the uncovered indices (cheaper than an argsort);
    # unfilled fix slots stay 0 — a harmless exact rewrite of slot 0
    unc_rank = jnp.cumsum(unc) - unc
    fix_idx = jnp.zeros((k_fix,), jnp.int32).at[
        jnp.where((unc == 1) & (unc_rank < k_fix), unc_rank, k_fix)].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    src = perm[fix_idx]
    out = {k: out[k].at[fix_idx].set(mat[i, :n][src])
           for i, k in enumerate(names)}
    overflow = jnp.maximum(n_unc - k_fix, 0).astype(jnp.int32)

    merged = _collect(dict(out), n)
    res = {}
    for k, v in arrays.items():
        m = merged[k]
        res[k] = m.astype(v.dtype) if m.dtype != v.dtype else m
    return res, overflow
