"""SPH smoothing kernels, vectorized over arrays.

Math follows the reference's cubic spline (base_solver.py:56-103) and PBF's
poly6/spiky pair (PBF.py:21-47), but is written branch-free with ``jnp.where``
so it vectorizes on the TPU VPU instead of per-thread scalar branching.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def cubic_W(r: jnp.ndarray, h: float, dim: int) -> jnp.ndarray:
    """Cubic-spline kernel W(|r|). `r` is the distance (any shape)."""
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / 7.0 / math.pi
    else:
        k = 8.0 / math.pi
    k = k / h ** dim
    q = r / h
    q2 = q * q
    w_near = k * (6.0 * q * q2 - 6.0 * q2 + 1.0)
    one_q = 1.0 - q
    w_far = k * 2.0 * one_q * one_q * one_q
    w = jnp.where(q <= 0.5, w_near, w_far)
    return jnp.where(q <= 1.0, w, 0.0)


def _cubic_norm(h: float, dim: int) -> float:
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / 7.0 / math.pi
    else:
        k = 8.0 / math.pi
    return k / h ** dim


def cubic_w_gw_d2(d2: jnp.ndarray, h: float, dim: int,
                  need_w: bool = True, need_gw: bool = True):
    """(W, gw) from SQUARED distance — the pair engines' hot form.

    One ``rsqrt`` replaces the sqrt + division of the r-native forms
    (gw = c(q)/(|R| h), with the near branch's q cancelling analytically);
    measured ~25% of per-pair VPU work at 405k. Callers' pair masks already
    enforce the strict q < 1 support (cells are exactly h wide), so the
    outer cutoff select is skipped here — out-of-support lanes may hold
    garbage, which ``Cx.sum``'s where-select discards.
    """
    k = _cubic_norm(h, dim)
    inv_r = jnp.sqrt(1.0 / jnp.maximum(d2, 1e-24))
    q = jnp.minimum(d2 * inv_r / h, 1.0)
    near = q <= 0.5
    w = gw = None
    if need_w:
        q2 = q * q
        one_q = 1.0 - q
        w = jnp.where(near, k * (6.0 * q * q2 - 6.0 * q2 + 1.0),
                      k * 2.0 * one_q * one_q * one_q)
    if need_gw:
        one_q = 1.0 - q
        # c/(q h^2): near branch q cancels; far branch uses h*inv_r == 1/q
        gw_near = 3.0 * q - 2.0
        gw_far = -one_q * one_q * (h * inv_r)
        gw = (6.0 * k / (h * h)) * jnp.where(near, gw_near, gw_far)
        # reference zeroes the gradient inside |R| <= 1e-5 (base_solver.py:86)
        gw = jnp.where(d2 > 1e-10, gw, 0.0)
    return w, gw


def cubic_W0(h: float, dim: int) -> float:
    """W(0) as a python float (used for the self-density contribution)."""
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / 7.0 / math.pi
    else:
        k = 8.0 / math.pi
    return k / h ** dim


def cubic_grad_W(R: jnp.ndarray, h: float, dim: int,
                 dist: jnp.ndarray | None = None) -> jnp.ndarray:
    """Gradient of the cubic spline, ∇W(R) for displacement vectors R (..., dim).

    Matches base_solver.py:80-103: zero inside |R| < 1e-5 and outside q > 1.
    """
    if dim == 1:
        k = 4.0 / 3.0
    elif dim == 2:
        k = 40.0 / 7.0 / math.pi
    else:
        k = 8.0 / math.pi
    k = 6.0 * k / h ** dim
    if dist is None:
        dist = jnp.linalg.norm(R, axis=-1)
    q = dist / h
    safe = jnp.maximum(dist, 1e-12)
    # grad_q = R / (|R| h); coefficient c(q) multiplies grad_q
    c_near = k * q * (3.0 * q - 2.0)
    one_q = 1.0 - q
    c_far = -k * one_q * one_q
    c = jnp.where(q <= 0.5, c_near, c_far)
    c = jnp.where((dist > 1e-5) & (q <= 1.0), c, 0.0)
    return (c / (safe * h))[..., None] * R


def W(r: jnp.ndarray, h: float, dim: int, kind: str = "cubic") -> jnp.ndarray:
    """Kernel dispatch: PBF overrides the cubic spline with poly6
    (reference PBF.py:21-32)."""
    if kind == "cubic":
        return cubic_W(r, h, dim)
    return poly6_W(r, h)


def W0(h: float, dim: int, kind: str = "cubic") -> float:
    if kind == "cubic":
        return cubic_W0(h, dim)
    return 0.0  # poly6 is defined 0 at r == 0 in the reference (PBF.py:27)


def grad_W(R: jnp.ndarray, h: float, dim: int,
           dist: jnp.ndarray | None = None, kind: str = "cubic") -> jnp.ndarray:
    """Gradient dispatch: PBF uses the spiky gradient (PBF.py:34-47)."""
    if kind == "cubic":
        return cubic_grad_W(R, h, dim, dist)
    return spiky_grad_W(R, h, dist)


def grad_W_coef(dist: jnp.ndarray, h: float, dim: int,
                kind: str = "cubic") -> jnp.ndarray:
    """Scalar c(|R|) with gradW = c * R — the component form used by the
    pair-kernel executors (ops/pair_exec.py)."""
    if kind == "cubic":
        if dim == 1:
            k = 4.0 / 3.0
        elif dim == 2:
            k = 40.0 / 7.0 / math.pi
        else:
            k = 8.0 / math.pi
        k = 6.0 * k / h ** dim
        q = dist / h
        safe = jnp.maximum(dist, 1e-12)
        c_near = k * q * (3.0 * q - 2.0)
        one_q = 1.0 - q
        c_far = -k * one_q * one_q
        c = jnp.where(q <= 0.5, c_near, c_far)
        c = jnp.where((dist > 1e-5) & (q <= 1.0), c, 0.0)
        return c / (safe * h)
    # spiky (PBF.py:34-47)
    fac = -45.0 / math.pi
    safe = jnp.maximum(dist, 1e-12)
    x = (h - dist) / (h * h * h)
    c = fac * x * x / safe
    return jnp.where((dist > 0) & (dist < h), c, 0.0)


def poly6_W(r: jnp.ndarray, h: float) -> jnp.ndarray:
    """PBF poly6 kernel (PBF.py:21-32). Note: zero at r == 0, like the reference."""
    fac = 315.0 / 64.0 / math.pi
    x = (h * h - r * r) / (h * h * h)
    w = fac * x * x * x
    return jnp.where((r > 0) & (r < h), w, 0.0)


def spiky_grad_W(R: jnp.ndarray, h: float,
                 dist: jnp.ndarray | None = None) -> jnp.ndarray:
    """PBF spiky gradient (PBF.py:34-47)."""
    fac = -45.0 / math.pi
    if dist is None:
        dist = jnp.linalg.norm(R, axis=-1)
    safe = jnp.maximum(dist, 1e-12)
    x = (h - dist) / (h * h * h)
    c = fac * x * x / safe
    c = jnp.where((dist > 0) & (dist < h), c, 0.0)
    return c[..., None] * R
