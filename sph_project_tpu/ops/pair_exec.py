"""Unified pair-kernel execution: one physics body, two executors.

Pair kernels are written once in *component form* against :class:`Cx` —
every quantity is a 2-D-broadcastable (rows=block particles, cols=window
candidates) array, vectors are component tuples, and the only reduction is
``cx.sum`` over the window axis. The same body then runs on:

- :func:`run_pallas` — a Pallas TPU kernel that tiles the window axis in
  VMEM flash-attention-style, so the (B, W) pair tensors never touch HBM, and
- :func:`run_jax` — a chunked lax.map executor (CPU tests, fallback).

Outlier bucketing: when ``env.big_ids`` is set (PairEnv built with
``params.pair_slab_big``), a second pass reruns the outlier blocks — whose
windows exceed the common cap S — against big windows, and their rows replace
the pass-1 results. This keeps S sized for the typical block instead of the
worst wall-sheet-spanning one.

Layout notes (TPU): all slab data is (NB, W) f32 per scalar component —
vector fields are passed as separate components so the lane dimension is
always the wide window axis; block scalars are (NB, B).
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.params import SimParams
from .pairs import PairEnv, SlabField, _gather_field, block


class Cx:
    """Kernel-facing view of one (rows x cols) pair tile.

    blk(name): block scalar shaped (..., B, 1); slab(name): window scalar
    shaped (..., 1, W); geometry(): (Rx, Ry, Rz), d2, mask; sum(x, mask):
    masked reduction over the window axis -> (..., B).
    """

    def __init__(self, blocks, slabs, jidx, valid, row_slab, row_block,
                 row_off, gidx, params: SimParams):
        self._b = blocks
        self._s = slabs
        self._jidx = jidx
        self._valid = valid
        self._row_slab = row_slab
        self._row_block = row_block
        self._row_off = row_off
        self._gidx = gidx
        self.params = params
        self.dim = params.dim

    def blk(self, name: str) -> jnp.ndarray:
        return self._b[name][..., :, None]

    def slab(self, name: str) -> jnp.ndarray:
        return self._s[name][..., None, :]

    def has_slab(self, name: str) -> bool:
        return name in self._s

    def vec_blk(self, name: str):
        return tuple(self.blk(f"{name}{d}") for d in range(self.dim))

    def vec_slab(self, name: str):
        return tuple(self.slab(f"{name}{d}") for d in range(self.dim))

    def geometry(self, pos_blk: str = "pos", pos_slab: str = "pos",
                 strict: bool = True):
        """R components (x_i - x_j), squared distance, and the standard pair
        mask (strict |R| < dh, not-self, window-valid, row-matched)."""
        R = tuple(self.blk(f"{pos_blk}{d}") - self.slab(f"{pos_slab}{d}")
                  for d in range(self.dim))
        d2 = sum(r * r for r in R)
        not_self = self._jidx[..., None, :] != self._gidx[..., :, None]
        row_match = self._row_slab[..., None, :] == \
            (self._row_block[..., :, None] + self._row_off[..., None, :])
        mask = (self._valid[..., None, :] != 0) & not_self & row_match
        if strict:
            mask = mask & (d2 < self.params.support_radius ** 2)
        return R, d2, mask

    @staticmethod
    def sum(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        return jnp.sum(jnp.where(mask, x, 0), axis=-1)

    @staticmethod
    def where(c, a, b):
        return jnp.where(c, a, b)

    def cross(self, a, b):
        """Component cross product; returns dim components (2D: 1 scalar)."""
        if self.dim == 3:
            return (a[1] * b[2] - a[2] * b[1],
                    a[2] * b[0] - a[0] * b[2],
                    a[0] * b[1] - a[1] * b[0])
        return (a[0] * b[1] - a[1] * b[0],)


def _split(d: Dict[str, jnp.ndarray]) -> Dict[str, jnp.ndarray]:
    """Expand trailing-dim vectors into scalar components name0..name{d-1}."""
    out = {}
    for k, v in d.items():
        if v.ndim == 2:
            for i in range(v.shape[1]):
                out[f"{k}{i}"] = v[:, i]
        else:
            out[k] = v
    return out


def _rows_of(x: jnp.ndarray, ids: jnp.ndarray) -> jnp.ndarray:
    """Gather rows (M,) of a (NB, X) array as (1, X) slices (fast on TPU)."""
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1,), collapsed_slice_dims=(0,), start_index_map=(0,))
    return jax.lax.gather(x, ids[:, None], dn, (1, x.shape[1]),
                          mode=jax.lax.GatherScatterMode.CLIP)


def prepare_inputs(env: PairEnv, slabs: Dict, fields: Dict, params: SimParams):
    """Blocks + small/big slab components + mask metadata for both passes."""
    B = params.pair_block
    NB = env.nb
    n = NB * B
    ns = env.starts.shape[1]
    S = env.slab_width // ns
    bucketed = env.big_ids is not None
    Sb = env.jidx_big.shape[1] // ns if bucketed else 0

    slab_small: Dict[str, jnp.ndarray] = {}
    slab_big: Dict[str, jnp.ndarray] = {}

    def add(name, small, big):
        if small.ndim == 3:
            for i in range(small.shape[2]):
                slab_small[f"{name}{i}"] = small[:, :, i]
                if bucketed:
                    slab_big[f"{name}{i}"] = big[:, :, i]
        else:
            slab_small[name] = small
            if bucketed:
                slab_big[name] = big

    add("pos", env.pos_slab, env.pos_slab_big)
    for k, v in (slabs or {}).items():
        if isinstance(v, SlabField):
            add(k, v.small, v.big)
        elif hasattr(v, "shape") and v.shape[0] == n:
            small = _gather_field(v, env.starts, S)
            big = _gather_field(v, env.starts_big, Sb) if bucketed else None
            add(k, small, big)
        else:
            if bucketed:
                raise ValueError(f"slab '{k}' lacks big-window data")
            add(k, v, None)

    blocks = {k: v.reshape(NB, B) for k, v in _split(fields).items()}
    row_block = block(env.rows, B)
    meta_s = dict(jidx=env.jidx, valid=env.valid.astype(jnp.int32),
                  row_slab=env.row_slab, row_block=row_block,
                  gidx=jnp.arange(n, dtype=jnp.int32).reshape(NB, B))
    meta_b = None
    blocks_b = None
    if bucketed:
        ids = env.big_ids
        blocks_b = {k: _rows_of(v, ids) for k, v in blocks.items()}
        meta_b = dict(jidx=env.jidx_big, valid=env.valid_big.astype(jnp.int32),
                      row_slab=env.row_slab_big,
                      row_block=_rows_of(row_block, ids),
                      gidx=ids[:, None] * B +
                      jnp.arange(B, dtype=jnp.int32)[None, :])
    return blocks, slab_small, meta_s, blocks_b, slab_big, meta_b


def _collect(out: Dict[str, jnp.ndarray], n: int) -> Dict[str, jnp.ndarray]:
    """Merge component outputs name0..name{d-1} back into (N, d) vectors."""
    merged: Dict[str, jnp.ndarray] = {}
    comps: Dict[str, list] = {}
    for k in sorted(out.keys()):
        if k[-1].isdigit() and k[:-1] != "":
            comps.setdefault(k[:-1], []).append(out[k])
        else:
            merged[k] = out[k].reshape(-1)
    for k, vs in comps.items():
        merged[k] = jnp.stack([v.reshape(-1) for v in vs], axis=-1)
    return merged


def _out_shapes(kern, blocks, slabs_c, params, B, Wt):
    def probe(b_, s_):
        z = jnp.zeros
        cx = Cx(b_, s_, z((1, Wt), jnp.int32), z((1, Wt), jnp.int32),
                z((1, Wt), jnp.int32), z((1, B), jnp.int32),
                z((1, Wt), jnp.int32), z((1, B), jnp.int32), params)
        return kern(cx)
    bs = {k: jax.ShapeDtypeStruct((1, B), v.dtype) for k, v in blocks.items()}
    ss = {k: jax.ShapeDtypeStruct((1, Wt), v.dtype) for k, v in slabs_c.items()}
    return jax.eval_shape(probe, bs, ss)


def _exec_pallas(kern, blocks, slabs_c, meta, row_off, params, interpret):
    B = params.pair_block
    NB = blocks[next(iter(blocks))].shape[0]
    W = meta["jidx"].shape[1]
    # window tile must divide the slab width AND be lane-aligned (multiple of
    # 128); fall back to the largest such divisor <= pair_wtile (an untiled W
    # blows the scoped-VMEM budget, a non-128-multiple fails lowering)
    Wt = W
    for cand in range(min(params.pair_wtile, W) // 128 * 128, 0, -128):
        if W % cand == 0:
            Wt = cand
            break
    T = W // Wt
    out_shapes = _out_shapes(kern, blocks, slabs_c, params, B, Wt)
    out_names = sorted(out_shapes.keys())
    block_names = sorted(blocks.keys())
    slab_names = sorted(slabs_c.keys())

    def kernel_fn(*refs):
        nb_refs = refs[: len(block_names)]
        sl_refs = refs[len(block_names): len(block_names) + len(slab_names)]
        jidx_r, valid_r, row_slab_r, row_block_r, row_off_r, gidx_r = \
            refs[len(block_names) + len(slab_names):
                 len(block_names) + len(slab_names) + 6]
        out_refs = refs[len(block_names) + len(slab_names) + 6:]
        t = pl.program_id(1)
        b_d = {k: r[:].reshape(1, B) for k, r in zip(block_names, nb_refs)}
        s_d = {k: r[:].reshape(1, Wt) for k, r in zip(slab_names, sl_refs)}
        cx = Cx(b_d, s_d, jidx_r[:].reshape(1, Wt), valid_r[:].reshape(1, Wt),
                row_slab_r[:].reshape(1, Wt), row_block_r[:].reshape(1, B),
                row_off_r[:].reshape(1, Wt), gidx_r[:].reshape(1, B), params)
        out = kern(cx)
        for name, oref in zip(out_names, out_refs):
            val = out[name].reshape(1, 1, B)
            @pl.when(t == 0)
            def _(oref=oref, val=val):
                oref[:] = val
            @pl.when(t != 0)
            def _(oref=oref, val=val):
                oref[:] = oref[:] + val

    bspec = pl.BlockSpec((1, 1, B), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, 1, Wt), lambda b, t: (b, 0, t), memory_space=pltpu.VMEM)
    off_spec = pl.BlockSpec((1, 1, Wt), lambda b, t: (0, 0, t), memory_space=pltpu.VMEM)
    in_specs = ([bspec] * len(block_names) + [wspec] * len(slab_names) +
                [wspec, wspec, wspec, bspec, off_spec, bspec])
    out_specs = [pl.BlockSpec((1, 1, B), lambda b, t: (b, 0, 0),
                              memory_space=pltpu.VMEM) for _ in out_names]
    out_shape = [jax.ShapeDtypeStruct((NB, 1, B), out_shapes[k].dtype)
                 for k in out_names]

    def lift(x):
        return x[:, None, :]
    inputs = ([lift(blocks[k]) for k in block_names]
              + [lift(slabs_c[k]) for k in slab_names]
              + [lift(meta["jidx"]), lift(meta["valid"]),
                 lift(meta["row_slab"]), lift(meta["row_block"]),
                 row_off[None, None, :], lift(meta["gidx"])])
    outs = pl.pallas_call(
        kernel_fn, grid=(NB, T), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(*inputs)
    return {k: v.reshape(NB, B) for k, v in zip(out_names, outs)}


def _exec_jax(kern, blocks, slabs_c, meta, row_off, params):
    NB = blocks[next(iter(blocks))].shape[0]
    c = 1
    for cand in range(min(NB, params.pair_chunk), 0, -1):
        if NB % cand == 0:
            c = cand
            break
    nchunks = NB // c

    def resh(x):
        return x.reshape((nchunks, c) + x.shape[1:])

    args = (jax.tree.map(resh, blocks), jax.tree.map(resh, slabs_c),
            jax.tree.map(resh, meta))

    def body(a):
        b_c, s_c, m_c = a
        cx = Cx(b_c, s_c, m_c["jidx"], m_c["valid"], m_c["row_slab"],
                m_c["row_block"], row_off, m_c["gidx"], params)
        return kern(cx)

    out = jax.lax.map(body, args)
    return jax.tree.map(lambda y: y.reshape((NB,) + y.shape[2:]), out)


def run(kern: Callable, env, slabs: Dict, fields: Dict,
        params: SimParams) -> Dict[str, jnp.ndarray]:
    """Execute a component pair kernel: pass 1 over all blocks (small
    windows), pass 2 over outlier blocks (big windows), merged.

    With a :class:`~.pair_dma.DmaPairEnv` the same kernel body runs through
    the kernel-side-DMA engine instead (slabs/fields are raw arrays there)."""
    if hasattr(env, "halo"):          # SpatialEnv (parallel/spatial.py)
        from ..parallel import spatial
        return spatial.spatial_run(kern, env, slabs, fields, params)
    if hasattr(env, "meta_pack"):
        from . import pair_dma
        return pair_dma.run(kern, env, slabs, fields, params)
    assert "pos" in fields, "fields must include 'pos' (center positions)"
    B = params.pair_block
    NB = env.nb
    n = NB * B
    use_pallas = (params.resolved_pair_backend() == "pallas" and
                  jax.default_backend() == "tpu")
    blocks, ssm, meta_s, blocks_b, sbg, meta_b = prepare_inputs(
        env, slabs, fields, params)

    if use_pallas:
        out = _exec_pallas(kern, blocks, ssm, meta_s, env.row_off, params,
                           interpret=False)
    else:
        out = _exec_jax(kern, blocks, ssm, meta_s, env.row_off, params)

    if env.big_ids is not None:
        if use_pallas:
            out_b = _exec_pallas(kern, blocks_b, sbg, meta_b, env.row_off_big,
                                 params, interpret=False)
        else:
            out_b = _exec_jax(kern, blocks_b, sbg, meta_b, env.row_off_big,
                              params)
        sel = env.big_flag[env.big_ids][:, None]
        ids = env.big_ids
        merged = {}
        for k in out:
            rows = jnp.where(sel, out_b[k], _rows_of(out[k], ids))
            merged[k] = out[k].at[ids].set(rows)
        out = merged
    return _collect(out, n)
