"""Dense pair engine (ops/pairs.py) vs brute force."""
import jax.numpy as jnp
import numpy as np
import pytest

from sph_project_tpu.core.params import make_params
from sph_project_tpu.ops import kernels, neighbors as nb, pairs


def sorted_setup(seed=0, n_active=400, dim=3, pair_block=64, pair_slab=1024):
    rng = np.random.default_rng(seed)
    params = make_params(n_active, dim=dim, particle_radius=0.01,
                         domain_start=(0.0,) * dim,
                         domain_end=(0.4, 0.3, 0.5)[:dim],
                         neighbor_cap=256,   # brute-force list must not truncate
                         pair_block=pair_block, pair_slab=pair_slab)
    pos = rng.uniform(0.02, 0.28, size=(params.n_pad, dim)).astype(np.float32)
    active = np.zeros(params.n_pad, dtype=bool)
    active[:n_active] = True
    pos, active = jnp.asarray(pos), jnp.asarray(active)
    cells = nb.flat_cell_ids(pos, active, params)
    perm = nb.sort_permutation(cells)
    return params, pos[perm], cells[perm], active[perm]


@pytest.mark.parametrize("seed", [0, 1])
def test_dense_counts_match_bruteforce(seed):
    params, spos, scells, sact = sorted_setup(seed)
    env = pairs.make_pair_env(spos, scells, params)
    assert int(env.overflow) == 0
    _, d2, mask = pairs.pair_geometry(env, spos, params)
    cnt = np.asarray(pairs.psum(jnp.ones_like(d2), mask)).astype(int)
    ref = nb.build_neighbors_bruteforce(spos, sact, params)
    a = np.asarray(sact)
    np.testing.assert_array_equal(cnt[a], np.asarray(ref.count)[a])
    # inactive rows see nobody (windows never cover the sentinel tail)
    assert (cnt[~a] == 0).all() if (~a).any() else True


def test_dense_density_matches_listpath():
    params, spos, scells, sact = sorted_setup(2)
    env = pairs.make_pair_env(spos, scells, params)
    _, d2, mask = pairs.pair_geometry(env, spos, params)
    W = jnp.where(mask, kernels.cubic_W(jnp.sqrt(d2), params.support_radius, 3), 0.0)
    dens_dense = np.asarray(pairs.psum(W, mask))
    nbrs = nb.build_neighbors(spos, scells, params)
    Wl = jnp.where(nbrs.mask, kernels.cubic_W(
        jnp.linalg.norm(spos[:, None, :] - spos[nbrs.idx], axis=-1),
        params.support_radius, 3), 0.0)
    dens_list = np.asarray(jnp.sum(Wl, axis=1))
    a = np.asarray(sact)
    np.testing.assert_allclose(dens_dense[a], dens_list[a], rtol=1e-5, atol=1e-3)


def test_slab_pack_round_trip():
    params, spos, scells, _ = sorted_setup(3)
    env = pairs.make_pair_env(spos, scells, params)
    f1 = jnp.arange(params.n_pad, dtype=jnp.float32)
    f2 = jnp.stack([f1, f1 * 2, f1 * 3], axis=1)
    m = (jnp.arange(params.n_pad) % 3).astype(jnp.int32)
    sl = pairs.slab_pack(env, {"a": f1, "b": f2, "m": m})
    assert sl["a"].small.shape == (env.nb, env.slab_width)
    assert sl["b"].small.shape == (env.nb, env.slab_width, 3)
    assert sl["m"].small.dtype == jnp.int32
    # spot check: values at valid columns equal field at jidx
    a = np.asarray(sl["a"].small)
    jidx = np.asarray(env.jidx); v = np.asarray(env.valid)
    np.testing.assert_array_equal(a[v], np.asarray(f1)[jidx[v]])
    np.testing.assert_array_equal(np.asarray(sl["m"].small)[v],
                                  np.asarray(m)[jidx[v]])


def test_overflow_reported_on_tiny_slab():
    params, spos, scells, _ = sorted_setup(4, pair_slab=8)
    env = pairs.make_pair_env(spos, scells, params)
    assert int(env.overflow) > 0


@pytest.mark.slow
def test_bucketing_matches_bruteforce():
    """Outlier bucketing (domain-box wall sheets span sorted-order gaps)
    must still find exactly the brute-force neighbor sets."""
    import jax
    from sph_project_tpu.utils.config import SimConfig
    from sph_project_tpu.scene import load_scene
    from sph_project_tpu.ops import pair_exec

    cfg = SimConfig(config={
        "Configuration": {
            "domainStart": [0, 0, 0], "domainEnd": [0.8, 0.6, 0.6],
            "addDomainBox": True, "particleRadius": 0.01,
            "density0": 1000, "gravitation": [0, -9.81, 0],
            "simulationMethod": "wcsph", "viscosityMethod": "standard",
            "timeStepSize": 5e-4, "viscosity": 0.05,
        },
        "FluidBlocks": [{
            "objectId": 0, "start": [0.1, 0.06, 0.1], "end": [0.35, 0.3, 0.35],
            "translation": [0, 0, 0], "scale": [1, 1, 1], "velocity": [0, 0, 0],
            "density": 1000.0, "color": [50, 100, 200], "entryTime": -1.0}],
    })
    scene, state = load_scene(config=cfg, neighbor_cap=256)
    params = scene.params
    assert params.pair_slab_big > params.pair_slab  # bucketing active
    p = state.particles
    active = p.material != 0
    cells = nb.flat_cell_ids(p.pos, active, params)
    perm = nb.sort_permutation(cells)
    p2 = jax.tree.map(
        lambda a: jnp.stack([a[:, d][perm] for d in range(a.shape[1])], axis=1)
        if a.ndim == 2 else a[perm], p)
    env = pairs.make_pair_env(p2.pos, cells[perm], params)
    assert env.big_ids is not None
    assert int(env.overflow) == 0

    def count_kernel(cx):
        _, d2, mask = cx.geometry()
        return {"cnt": cx.sum(jnp.ones_like(d2), mask)}
    cnt = np.asarray(pair_exec.run(count_kernel, env, {}, {"pos": p2.pos},
                                   params)["cnt"]).astype(int)
    ref = nb.build_neighbors_bruteforce(p2.pos, active[perm], params)
    a = np.asarray(active[perm])
    assert int(ref.k_overflow) == 0
    np.testing.assert_array_equal(cnt[a], np.asarray(ref.count)[a])
    assert (cnt[~a] == 0).all()
