import math

import jax.numpy as jnp
import numpy as np
import pytest

from sph_project_tpu.ops import kernels


@pytest.mark.parametrize("dim", [2, 3])
def test_cubic_normalization(dim):
    """Integral of W over its support is ~1 (kernel is a partition of unity)."""
    h = 0.04
    n = 80
    xs = np.linspace(-h, h, n, endpoint=False) + h / n
    if dim == 3:
        g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1).reshape(-1, 3)
        dv = (2 * h / n) ** 3
    else:
        g = np.stack(np.meshgrid(xs, xs, indexing="ij"), -1).reshape(-1, 2)
        dv = (2 * h / n) ** 2
    r = np.linalg.norm(g, axis=-1)
    W = np.asarray(kernels.cubic_W(jnp.asarray(r), h, dim))
    assert abs(W.sum() * dv - 1.0) < 2e-2


def test_cubic_W0_matches_limit():
    h = 0.04
    w0 = kernels.cubic_W0(h, 3)
    w_eps = float(kernels.cubic_W(jnp.asarray(1e-9), h, 3))
    assert abs(w0 - w_eps) / w0 < 1e-5
    assert abs(w0 - 8.0 / math.pi / h ** 3) < 1e-6


def test_cubic_gradient_antisymmetry_and_fd():
    h = 0.04
    rng = np.random.default_rng(0)
    R = jnp.asarray(rng.uniform(-h * 0.7, h * 0.7, (100, 3)).astype(np.float32))
    g1 = np.asarray(kernels.cubic_grad_W(R, h, 3))
    g2 = np.asarray(kernels.cubic_grad_W(-R, h, 3))
    np.testing.assert_allclose(g1, -g2, atol=1e-6)
    # finite-difference check of one component
    eps = 1e-4
    Rp = R.at[:, 0].add(eps)
    Rm = R.at[:, 0].add(-eps)
    fd = (np.asarray(kernels.cubic_W(jnp.linalg.norm(Rp, axis=-1), h, 3)) -
          np.asarray(kernels.cubic_W(jnp.linalg.norm(Rm, axis=-1), h, 3))) / (2 * eps)
    keep = np.linalg.norm(np.asarray(R), axis=-1) > 1e-3  # grad zeroed near 0
    np.testing.assert_allclose(g1[keep, 0], fd[keep], rtol=2e-2, atol=2.0)


def test_cutoff():
    h = 0.04
    r = jnp.asarray([h, h * 1.01, h * 2])
    assert np.all(np.asarray(kernels.cubic_W(r, h, 3))[1:] == 0.0)
    R = jnp.asarray([[h * 1.5, 0, 0]])
    assert np.all(np.asarray(kernels.cubic_grad_W(R, h, 3)) == 0.0)


def test_poly6_spiky_reference_forms():
    """Poly6/spiky match the PBF paper forms (reference PBF.py:21-47)."""
    h = 1.12
    r = 0.5
    w = float(kernels.poly6_W(jnp.asarray(r), h))
    expect = 315.0 / 64.0 / math.pi * ((h * h - r * r) / h ** 3) ** 3
    assert abs(w - expect) / expect < 1e-5
    assert float(kernels.poly6_W(jnp.asarray(0.0), h)) == 0.0  # zero at r=0
    R = jnp.asarray([[0.5, 0.0, 0.0]])
    g = np.asarray(kernels.spiky_grad_W(R, h))[0]
    expect_g = -45.0 / math.pi * ((h - r) / h ** 3) ** 2 / r * np.array([r, 0, 0])
    np.testing.assert_allclose(g, expect_g, rtol=1e-4)
