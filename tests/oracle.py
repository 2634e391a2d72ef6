"""Brute-force float64 NumPy oracle of the reference's WCSPH/DFSPH physics.

The reference (jason-huang03/SPH_Project) cannot execute in this environment
(taichi is not installed and there is no network), so golden parity is
established against this independent O(N^2) implementation of the SAME
formulas the engine cites, in float64 with exact neighbor sets:

- cubic spline kernel + gradient        base_solver.py:56-103
- density summation                     base_solver.py:521-541
- gravity / surface tension / viscosity base_solver.py:202-278
- Tait EOS (gamma=7, k=50000)           WCSPH.py:12-24
- symmetric pressure acceleration       base_solver.py:135-172
- DFSPH alpha + both correctors         DFSPH.py:22-294
- semi-implicit Euler + boundary clamp  base_solver.py:543-665
- step orderings                        WCSPH.py:27-45, DFSPH.py:298-319

Fluid-only scenes (no rigid bodies, no emitter).
"""
from __future__ import annotations

import math

import numpy as np


class Oracle:
    def __init__(self, pos, vel, *, h, dt, rho0=1000.0, v0=None,
                 gravity=(0.0, -9.81, 0.0), viscosity=0.05,
                 surface_tension=0.01, domain=((0, 0, 0), (1, 1, 1)),
                 padding=None):
        self.pos = np.asarray(pos, np.float64).copy()
        self.vel = np.asarray(vel, np.float64).copy()
        self.n, self.dim = self.pos.shape
        self.h = float(h)
        self.dt = float(dt)
        self.rho0 = float(rho0)
        self.v0 = float(v0)
        self.mass = np.full(self.n, self.rho0 * self.v0)
        self.g = np.asarray(gravity, np.float64)
        self.nu = float(viscosity)
        self.st = float(surface_tension)
        self.lo = np.asarray(domain[0], np.float64)
        self.hi = np.asarray(domain[1], np.float64)
        self.padding = self.h if padding is None else float(padding)
        self.density = np.full(self.n, self.rho0)
        self.pressure = np.zeros(self.n)
        self.acc = np.zeros_like(self.pos)
        self.diameter = 2.0 * (self.h / (4.0 if self.dim == 3 else 3.0))

    # ---- kernel ------------------------------------------------------------
    def _sigma(self):
        k = 8.0 / math.pi if self.dim == 3 else 40.0 / 7.0 / math.pi
        return k / self.h ** self.dim

    def W(self, r):
        q = np.asarray(r) / self.h
        k = self._sigma()
        w = np.where(q <= 0.5, 6.0 * (q ** 3 - q ** 2) + 1.0,
                     2.0 * (1.0 - np.minimum(q, 1.0)) ** 3)
        return k * np.where(q < 1.0, w, 0.0)

    def gradW_coef(self, r):
        """grad W = coef * R with coef = c(q)/(r h) (base_solver.py:80-103)."""
        q = np.asarray(r) / self.h
        k = 6.0 * self._sigma()
        c = np.where(q <= 0.5, k * q * (3.0 * q - 2.0),
                     -k * (1.0 - np.minimum(q, 1.0)) ** 2)
        rs = np.maximum(r, 1e-12)
        return np.where((q < 1.0) & (r > 1e-12), c / (rs * self.h), 0.0)

    # ---- pair scaffolding ----------------------------------------------------
    def _pairs(self):
        R = self.pos[:, None, :] - self.pos[None, :, :]
        d2 = np.sum(R * R, axis=-1)
        r = np.sqrt(d2)
        mask = (d2 < self.h * self.h) & ~np.eye(self.n, dtype=bool)
        return R, r, mask

    # ---- ops ---------------------------------------------------------------
    def compute_density(self, R, r, mask):
        W = np.where(mask, self.W(r), 0.0)
        self.density = self.rho0 * self.v0 * (self.W(0.0) + W.sum(axis=1))

    def non_pressure_acceleration(self, R, r, mask):
        acc = np.tile(self.g, (self.n, 1))
        # surface tension (base_solver.py:209-229)
        d2 = r * r
        Wst = np.where(d2 > self.diameter ** 2, self.W(r), self.W(self.diameter))
        coef = np.where(mask, self.mass[None, :] * Wst, 0.0)
        acc -= self.st / self.mass[:, None] * np.einsum("ij,ijd->id", coef, R)
        # standard viscosity, fluid neighbors (base_solver.py:231-266)
        v_xy = np.einsum("ijd,ijd->ij", self.vel[:, None] - self.vel[None, :], R)
        gw = self.gradW_coef(r)
        m_ij = 0.5 * (self.mass[:, None] + self.mass[None, :])
        c = 2.0 * (self.dim + 2) * self.nu * m_ij / self.density[None, :] \
            / (d2 + 0.01 * self.h ** 2) * v_xy * gw
        c = np.where(mask, c, 0.0)
        acc += np.einsum("ij,ijd->id", c, R) / self.rho0
        self.acc = acc

    def pressure_acceleration(self, R, r, mask):
        gw = self.gradW_coef(r)
        p_rho2 = self.pressure / self.density ** 2
        term = self.mass[None, :] * (p_rho2[:, None] + p_rho2[None, :]) * gw
        term = np.where(mask, term, 0.0)
        return -np.einsum("ij,ijd->id", term, R)

    def enforce_boundary(self):
        lo = self.lo + self.padding
        hi = self.hi - self.padding
        over = self.pos > hi
        under = self.pos <= lo
        normal = over.astype(np.float64) - under.astype(np.float64)
        self.pos = np.clip(self.pos, lo, hi)
        nlen = np.linalg.norm(normal, axis=-1)
        hit = nlen > 1e-6
        nu = normal / np.maximum(nlen, 1e-12)[:, None]
        vdn = np.sum(self.vel * nu, axis=-1)
        refl = self.vel - 1.5 * vdn[:, None] * nu   # c_f = 0.5
        self.vel = np.where(hit[:, None], refl, self.vel)

    # ---- WCSPH -------------------------------------------------------------
    def step_wcsph(self):
        R, r, mask = self._pairs()
        self.compute_density(R, r, mask)
        self.non_pressure_acceleration(R, r, mask)
        self.vel += self.dt * self.acc
        self.density = np.maximum(self.density, self.rho0)
        self.pressure = 50000.0 * ((self.density / self.rho0) ** 7.0 - 1.0)
        self.acc = self.pressure_acceleration(R, r, mask)
        self.vel += self.dt * self.acc
        self.pos += self.dt * self.vel
        self.enforce_boundary()

    # ---- DFSPH -------------------------------------------------------------
    def compute_alpha(self, R, r, mask):
        gw = self.gradW_coef(r)
        c = np.where(mask, -self.v0 * gw, 0.0)             # grad = c * R
        vec = np.einsum("ij,ijd->id", c, R)
        sum_sq = np.sum(c * c * (r * r), axis=1)
        denom = sum_sq + np.sum(vec * vec, axis=-1)
        return np.where(denom > 1e-5, 1.0 / np.maximum(denom, 1e-30), 0.0)

    def _div_sum(self, vel, R, r, mask):
        gw = self.gradW_coef(r)
        dvR = np.einsum("ijd,ijd->ij", vel[:, None] - vel[None, :], R)
        return np.sum(np.where(mask, self.v0 * dvR * gw, 0.0), axis=1)

    def _correction(self, kappa, R, r, mask):
        gw = self.gradW_coef(r)
        k_rho = kappa / np.maximum(self.density, 1e-12)
        eps = 1e-5 * self.dt
        pair_k = np.abs(kappa[:, None] + kappa[None, :]) > eps
        coef = np.where(mask & pair_k,
                        (k_rho[:, None] + k_rho[None, :]) * self.rho0 *
                        self.v0 * gw, 0.0)
        return -np.einsum("ij,ijd->id", coef, R)

    def step_dfsph(self, alpha=None, density=None,
                   max_err=1e-4, max_err_v=1e-3, max_iter=1000):
        """One DFSPH step (DFSPH.py:298-319). Returns
        (alpha, density, iters_density, iters_div) carried to the next step."""
        R, r, mask = self._pairs()
        if density is None:
            self.compute_density(R, r, mask)
        else:
            self.density = density
        if alpha is None:
            alpha = self.compute_alpha(R, r, mask)

        self.non_pressure_acceleration(R, r, mask)
        self.vel += self.dt * self.acc

        # constant-density corrector (DFSPH.py:225-243)
        itr_d = 0
        err = np.inf
        star = np.maximum(self.density / self.rho0 +
                          self.dt * self._div_sum(self.vel, R, r, mask), 1.0)
        while itr_d < 1 or (err > max_err and itr_d < max_iter):
            kappa = (star - 1.0) * alpha / self.dt
            self.vel += self._correction(kappa, R, r, mask)
            star = np.maximum(self.density / self.rho0 +
                              self.dt * self._div_sum(self.vel, R, r, mask), 1.0)
            err = np.mean(star - 1.0)
            itr_d += 1

        self.pos += self.dt * self.vel
        self.enforce_boundary()

        # re-search + density/alpha at new positions
        R, r, mask = self._pairs()
        self.compute_density(R, r, mask)
        alpha = self.compute_alpha(R, r, mask)

        # divergence-free corrector (DFSPH.py:139-159) with the <20-neighbor
        # deficiency guard (DFSPH.py:79-85)
        eta = max_err_v * self.rho0 / self.dt
        itr_v = 0
        err = np.inf
        cnt = mask.sum(axis=1)

        def deriv(vel):
            d = np.maximum(self._div_sum(vel, R, r, mask), 0.0)
            return np.where(cnt < 20, 0.0, d)

        dv = deriv(self.vel)
        while itr_v < 1 or (err > eta and itr_v < max_iter):
            kappa_v = dv * alpha
            self.vel += self._correction(kappa_v, R, r, mask)
            dv = deriv(self.vel)
            err = np.mean(self.rho0 * dv)
            itr_v += 1
        return alpha, self.density.copy(), itr_d, itr_v
