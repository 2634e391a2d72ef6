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
    assert sl["a"].shape == (env.nb, env.slab_width)
    assert sl["b"].shape == (env.nb, env.slab_width, 3)
    assert sl["m"].dtype == jnp.int32
    # spot check: values at valid columns equal field at jidx
    a = np.asarray(sl["a"]); jidx = np.asarray(env.jidx); v = np.asarray(env.valid)
    np.testing.assert_array_equal(a[v], np.asarray(f1)[jidx[v]])
    np.testing.assert_array_equal(np.asarray(sl["m"])[v], np.asarray(m)[jidx[v]])


def test_overflow_reported_on_tiny_slab():
    params, spos, scells, _ = sorted_setup(4, pair_slab=8)
    env = pairs.make_pair_env(spos, scells, params)
    assert int(env.overflow) > 0
