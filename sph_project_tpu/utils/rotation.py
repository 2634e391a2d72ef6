"""Rotation helpers (counterpart of the reference's SPH/utils/rotation.py).

The reference exposes a Taichi skew-matrix helper (unused by its main path);
these are the JAX equivalents used by the rigid integrator family.
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """Cross-product (skew-symmetric) matrix [v]x, batched over leading dims."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)


def orthonormalize(R: jnp.ndarray) -> jnp.ndarray:
    """Project a near-rotation matrix back onto SO(3) via Gram-Schmidt."""
    a = R[..., :, 0]
    a = a / jnp.linalg.norm(a, axis=-1, keepdims=True)
    b = R[..., :, 1]
    b = b - jnp.sum(a * b, axis=-1, keepdims=True) * a
    b = b / jnp.linalg.norm(b, axis=-1, keepdims=True)
    c = jnp.cross(a, b)
    return jnp.stack([a, b, c], axis=-1)
