"""Incremental plane-padded sort permutation (params.sort_incremental).

Validates the argsort-free permutation build against the argsort-based
layout invariants, its overflow accounting, and end-to-end physics parity
with the default path.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from sph_project_tpu.core.params import make_params
from sph_project_tpu.ops import neighbors as nb
from sph_project_tpu.ops.pair_dma import _occurrence_table


def _params(n, dim=3):
    return make_params(n, dim=dim, particle_radius=0.01,
                       domain_start=(0.0,) * dim,
                       domain_end=(0.4, 0.3, 0.5)[:dim],
                       neighbor_cap=96, cell_cap=24, build_chunk=256)


def validate_layout(cells_sorted, params):
    """The invariants every plane-padded layout must satisfy (what the env
    builder and the DMA engine rely on): live runs per x-plane are
    contiguous, cell-ascending, and start at 64-aligned bases."""
    cs = np.asarray(cells_sorted)
    n = cs.shape[0]
    ncells = params.num_cells
    g = params.grid_num
    plane_stride = int(np.prod(g[1:]))
    live = cs < ncells
    # ascending cell ids over live slots in slot order
    lv = cs[live]
    assert (np.diff(lv) >= 0).all(), "live cells not ascending"
    # per-plane contiguity at 64-aligned padded bases
    planes = lv // plane_stride
    base = 0
    for x in range(g[0]):
        cnt = int((planes == x).sum())
        if cnt:
            slots = np.nonzero(live & (cs // plane_stride == x))[0]
            assert slots[0] == base, f"plane {x} starts at {slots[0]} != {base}"
            assert (np.diff(slots) == 1).all(), f"plane {x} not contiguous"
        base += (cnt + nb.PLANE_PAD - 1) // nb.PLANE_PAD * nb.PLANE_PAD
    assert base <= n


def _mutate(rng, cells_old_sorted, params, frac_move=0.03, frac_flip=0.01):
    """New cell ids per slot: a few crossers, a few activations/kills."""
    cs = np.asarray(cells_old_sorted).copy()
    n = cs.shape[0]
    ncells = params.num_cells
    live = cs < ncells
    mv = rng.random(n) < frac_move
    cs_new = cs.copy()
    # crossers: live particles jump to a random cell
    sel = live & mv
    cs_new[sel] = rng.integers(0, ncells, size=int(sel.sum()))
    # kills: live -> sentinel; activations: dead -> random cell
    flip = rng.random(n) < frac_flip
    cs_new[live & flip] = ncells
    dead = ~live
    cs_new[dead & flip] = rng.integers(0, ncells, size=int((dead & flip).sum()))
    return jnp.asarray(cs_new)


def _plane_padded_reference(cells, params):
    """Numpy reference of the plane-padded layout SPEC (per-plane tables,
    the shape of the original implementation): stable cell sort, each
    x-plane's run placed at a 64-aligned padded base, sentinel records
    absorbing the free slots (pad gaps + tail) in index order. The
    production build is pure scans (see plane_padded_permutation) — this
    pins it to the spec bit-for-bit, including the permuted cell ids."""
    cells = np.asarray(cells)
    n = cells.shape[0]
    g = params.grid_num
    ncells = params.num_cells
    plane_stride = int(np.prod(g[1:])) if len(g) > 1 else 1
    gx = g[0]
    order = np.argsort(cells, kind="stable")
    cs = cells[order]
    pl = np.where(cs >= ncells, gx, cs // plane_stride)
    counts = np.bincount(pl, minlength=gx + 1)
    base_sorted = np.concatenate([[0], np.cumsum(counts)[:-1]])
    padded = (counts + nb.PLANE_PAD - 1) // nb.PLANE_PAD * nb.PLANE_PAD
    base_pad = np.concatenate([[0], np.cumsum(padded)[:-1]])
    k = np.arange(n)
    sent = pl >= gx
    out_live = base_pad[np.minimum(pl, gx - 1)] + \
        (k - base_sorted[np.minimum(pl, gx - 1)])
    out_live = np.minimum(out_live, n - 1)
    occupied = np.zeros(n, bool)
    occupied[out_live[~sent]] = True
    free = np.nonzero(~occupied)[0]
    out = np.empty(n, np.int64)
    out[~sent] = out_live[~sent]
    out[sent] = free[k[sent] - base_sorted[gx]]
    perm = np.empty(n, np.int32)
    perm[out] = order
    return perm, cells[perm]


@pytest.mark.parametrize("seed,frac_live", [
    (0, 0.8), (1, 1.0), (2, 0.0), (3, 0.02), (4, 0.5)])
def test_plane_padded_matches_spec(seed, frac_live):
    """Scan-based plane_padded_permutation == the table-based spec, bit for
    bit (perm AND returned cells), across live fractions incl. all-live,
    all-dead, and nearly-empty grids (empty planes)."""
    rng = np.random.default_rng(seed)
    params = _params(1100)
    n = params.n_pad
    ncells = params.num_cells
    # the plane budget in n_pad guarantees padded placement fits only for
    # <= n_particles live records (params.py plane_budget) — respect it
    n_live = int(frac_live * params.n_particles)
    cells = np.full(n, ncells, np.int32)
    cells[rng.choice(n, size=n_live, replace=False)] = \
        rng.integers(0, ncells, size=n_live)
    # cluster half the live ids into few planes to exercise fat plane runs
    half = rng.random(n) < 0.5
    cells[half & (cells < ncells)] %= max(ncells // params.grid_num[0], 1)
    perm, cs = nb.plane_padded_permutation(
        jnp.asarray(cells), params, return_cells=True)
    ref_perm, ref_cs = _plane_padded_reference(cells, params)
    np.testing.assert_array_equal(np.asarray(perm), ref_perm)
    np.testing.assert_array_equal(np.asarray(cs), ref_cs)
    np.testing.assert_array_equal(np.asarray(cs), cells[np.asarray(perm)])
    if frac_live > 0 and frac_live < 1:
        validate_layout(cs, params)


def test_plane_padded_matches_spec_2d():
    rng = np.random.default_rng(11)
    params = _params(700, dim=2)
    n = params.n_pad
    n_live = int(0.7 * params.n_particles)
    cells = np.full(n, params.num_cells, np.int32)
    cells[rng.choice(n, size=n_live, replace=False)] = \
        rng.integers(0, params.num_cells, size=n_live)
    perm, cs = nb.plane_padded_permutation(
        jnp.asarray(cells), params, return_cells=True)
    ref_perm, ref_cs = _plane_padded_reference(cells, params)
    np.testing.assert_array_equal(np.asarray(perm), ref_perm)
    np.testing.assert_array_equal(np.asarray(cs), ref_cs)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_incremental_matches_layout_invariants(seed):
    rng = np.random.default_rng(seed)
    params = _params(900)
    n = params.n_pad
    cells0 = jnp.asarray(
        np.where(rng.random(n) < 0.8,
                 rng.integers(0, params.num_cells, size=n),
                 params.num_cells).astype(np.int32))
    perm0 = nb.plane_padded_permutation(cells0, params)
    cells_old = cells0[perm0]
    validate_layout(cells_old, params)
    t_start, t_end = _occurrence_table(cells_old, params.num_cells)

    cells_new = _mutate(rng, cells_old, params)
    perm, ovf = nb.incremental_plane_padded_permutation(
        cells_new, cells_old, t_start, t_end, params)
    assert int(ovf) == 0
    # bijection
    p = np.sort(np.asarray(perm))
    np.testing.assert_array_equal(p, np.arange(n))
    # resulting layout satisfies every plane-padding invariant
    validate_layout(cells_new[perm], params)
    # same live multiset as the argsort-based layout
    ref = np.sort(np.asarray(cells_new[nb.plane_padded_permutation(
        cells_new, params)]))
    got = np.sort(np.asarray(cells_new[perm]))
    np.testing.assert_array_equal(got, ref)


def test_incremental_overflow_is_loud():
    # the crosser budget is max(4096, n//4): n must exceed 4096 movers
    rng = np.random.default_rng(3)
    params = _params(9000)
    n = params.n_pad
    cells0 = jnp.asarray(
        rng.integers(0, params.num_cells, size=n).astype(np.int32))
    perm0 = nb.plane_padded_permutation(cells0, params)
    cells_old = cells0[perm0]
    t_start, t_end = _occurrence_table(cells_old, params.num_cells)
    # shift EVERY particle to a new cell: movers >> n//4 budget
    cells_new = (cells_old + 1) % params.num_cells
    _, ovf = nb.incremental_plane_padded_permutation(
        cells_new, cells_old, t_start, t_end, params)
    assert int(ovf) > 0


def test_crosser_counts_match_compaction():
    """crosser_counts (the hybrid's cond predicate) must count EXACTLY what
    incremental_plane_padded_permutation's compact() sees — otherwise the
    cond could admit an over-budget step into the zeroing branch."""
    rng = np.random.default_rng(7)
    params = _params(900)
    n = params.n_pad
    cells0 = jnp.asarray(
        np.where(rng.random(n) < 0.8,
                 rng.integers(0, params.num_cells, size=n),
                 params.num_cells).astype(np.int32))
    cells_old = cells0[nb.plane_padded_permutation(cells0, params)]
    cells_new = _mutate(rng, cells_old, params, frac_move=0.2, frac_flip=0.05)
    n_mov, n_lv = nb.crosser_counts(cells_new, cells_old, params)
    co = np.asarray(cells_old)
    cn = np.asarray(cells_new)
    ncells = params.num_cells
    live_n, live_o = cn < ncells, co < ncells
    stay = live_n & (cn == co)
    assert int(n_mov) == int((live_n & ~stay).sum())
    assert int(n_lv) == int((live_o & (cn != co)).sum())


def _dam_break_cfg():
    from sph_project_tpu.utils.config import SimConfig
    return SimConfig(config={
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.5, 0.5, 0.5],
            "addDomainBox": False, "particleRadius": 0.01,
            "density0": 1000, "gravitation": [0, -9.81, 0],
            "simulationMethod": "dfsph", "viscosityMethod": "standard",
            "timeStepSize": 1e-3, "viscosity": 0.05,
        },
        "FluidBlocks": [{
            "objectId": 0, "start": [0.08, 0.05, 0.08],
            "end": [0.3, 0.28, 0.3], "translation": [0, 0, 0],
            "scale": [1, 1, 1], "velocity": [0, 0, 0],
            "density": 1000.0, "color": [0, 0, 0], "entryTime": -1.0}],
    })


def _run_dam_break(steps=10, **scene_kw):
    from sph_project_tpu import sim as simlib
    from sph_project_tpu.scene import load_scene

    scene, state = load_scene(config=_dam_break_cfg(),
                              pair_backend="pallas_dma", **scene_kw)
    sim = simlib.Simulation(scene, state)
    diag = None
    taken = []
    for _ in range(steps):
        diag = sim.step()
        taken.append(int(diag.get("sort_inc_taken", -1)))
    assert int(diag["neighbor_overflow"]) == 0
    assert int(diag.get("sort_overflow_acc", 0)) == 0
    p = sim.state.particles
    live = np.asarray(p.material) != 0
    pos = np.asarray(p.pos)[live]
    return pos[np.lexsort(pos.T)], taken


@pytest.mark.slow
def test_incremental_sort_end_to_end_physics():
    """10 dam-break steps with sort_incremental on vs off: same physics
    (intra-cell summation order differs, so tolerance not bit-equality)."""
    a, _ = _run_dam_break(sort_incremental=False)
    b, taken = _run_dam_break(sort_incremental=True)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4)
    # the default budget (>= 4096 at this scale) admits every step
    assert all(t == 1 for t in taken[1:]), taken


@pytest.mark.slow
def test_hybrid_full_branch_on_budget_blowout():
    """A tiny sort_inc_budget forces the cond's full-sort branch whenever a
    step crosses more cells than the budget: overflow stays 0 (the zeroing
    branch is unreachable) and the physics matches the full sort."""
    a, _ = _run_dam_break(sort_incremental=False)
    b, taken = _run_dam_break(sort_incremental=True, sort_inc_budget=16)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4)
    # the dam break crosses >16 cells on most steps: the full branch ran
    assert any(t == 0 for t in taken), taken


if __name__ == "__main__":
    test_incremental_matches_layout_invariants(0)
