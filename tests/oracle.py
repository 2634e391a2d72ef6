"""Brute-force float64 NumPy oracle of the reference's WCSPH/DFSPH physics.

The reference (jason-huang03/SPH_Project) cannot execute in this environment
(taichi is not installed and there is no network), so golden parity is
established against this independent O(N^2) implementation of the SAME
formulas the engine cites, in float64 with exact neighbor sets:

- cubic spline kernel + gradient        base_solver.py:56-103
- poly6 / spiky kernel pair (PBF)       PBF.py:21-47
- density summation                     base_solver.py:521-541
- gravity / surface tension / viscosity base_solver.py:202-278
- Tait EOS (gamma=7, k=50000)           WCSPH.py:12-24
- symmetric pressure acceleration       base_solver.py:135-172
- DFSPH alpha + both correctors         DFSPH.py:22-294
- PCISPH lattice stiffness + refine     PCISPH.py:110-185
- IISPH relaxed Jacobi (dii/aii/sum_i)  IISPH.py:17-228
- PBF lambda / s_corr position fix      PBF.py:50-158
- semi-implicit Euler + boundary clamp  base_solver.py:543-665
- step orderings                        WCSPH.py:27-45, DFSPH.py:298-319,
                                        PCISPH.py:165-185, IISPH.py:203-228,
                                        PBF.py:145-158

Fluid-only scenes (no rigid bodies, no emitter).
"""
from __future__ import annotations

import math

import numpy as np


class Oracle:
    def __init__(self, pos, vel, *, h, dt, rho0=1000.0, v0=None,
                 gravity=(0.0, -9.81, 0.0), viscosity=0.05,
                 surface_tension=0.01, domain=((0, 0, 0), (1, 1, 1)),
                 padding=None, kernel="cubic", diameter=None):
        self.kernel = kernel  # "cubic", or "poly6" = PBF's poly6/spiky pair
        self._diameter = diameter  # 2*particleRadius when supportRadius is
        # explicit in the scene (the h-derived default assumes dh = 4r/3r)
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
        self.diameter = (2.0 * (self.h / (4.0 if self.dim == 3 else 3.0))
                         if self._diameter is None else float(self._diameter))

    # ---- kernel ------------------------------------------------------------
    def _sigma(self):
        k = 8.0 / math.pi if self.dim == 3 else 40.0 / 7.0 / math.pi
        return k / self.h ** self.dim

    def W(self, r):
        if self.kernel == "poly6":
            # PBF poly6 (PBF.py:21-32): zero at r == 0, like the reference
            r = np.asarray(r, np.float64)
            fac = 315.0 / 64.0 / math.pi
            x = (self.h ** 2 - r * r) / self.h ** 3
            return np.where((r > 0) & (r < self.h), fac * x ** 3, 0.0)
        q = np.asarray(r) / self.h
        k = self._sigma()
        w = np.where(q <= 0.5, 6.0 * (q ** 3 - q ** 2) + 1.0,
                     2.0 * (1.0 - np.minimum(q, 1.0)) ** 3)
        return k * np.where(q < 1.0, w, 0.0)

    def gradW_coef(self, r):
        """grad W = coef * R with coef = c(q)/(r h) (base_solver.py:80-103);
        for PBF the spiky gradient (PBF.py:34-47)."""
        if self.kernel == "poly6":
            r = np.asarray(r, np.float64)
            fac = -45.0 / math.pi
            rs = np.maximum(r, 1e-12)
            c = fac * ((self.h - r) / self.h ** 3) ** 2 / rs
            return np.where((r > 0) & (r < self.h), c, 0.0)
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

    # ---- PCISPH ------------------------------------------------------------
    def pcisph_k(self):
        """Ideal-lattice stiffness (PCISPH.py:128-151) in float64. Dim-aware
        like the engine (the reference hardcodes a 3D lattice but ships no 2D
        PCISPH scene, so 3D tests are exact parity)."""
        import itertools
        diam = self.diameter * 0.97
        max_i = int(self.h / diam) + 1
        sum_grad = np.zeros(self.dim)
        sum_grad2 = 0.0
        rng = range(-max_i, max_i + 1)
        for idx in itertools.product(rng, repeat=self.dim):
            x = -np.asarray(idx, np.float64) * diam
            r = float(np.linalg.norm(x))
            if 1e-5 < r < self.h:
                g = self.gradW_coef(r) * x
                sum_grad += g
                sum_grad2 += float(g @ g)
        denom = float(sum_grad @ sum_grad) + sum_grad2
        dtv = self.dt * self.v0
        return -0.5 / (dtv * dtv) / denom

    def step_pcisph(self, eta=1e-3, max_iter=1000):
        """One PCISPH step (PCISPH.py:165-185). Returns (iters, err).

        Neighbor candidacy comes from the step-start grid — for_all_neighbors
        tests distances against particle_positions, which stay the originals
        during refine (only *predicted* positions move) — so the candidate
        mask is fixed at step start while density* evaluates W at the
        predicted distances (PCISPH.py:48-62). rho* has NO self-contribution
        (PCISPH.py:33-45), unlike compute_density.
        """
        R, r, mask = self._pairs()
        self.compute_density(R, r, mask)
        self.non_pressure_acceleration(R, r, mask)
        k = self.pcisph_k()
        # init_step (PCISPH.py:153-162)
        pressure = np.zeros(self.n)
        pred_v = self.vel + self.dt * self.acc
        pred_x = self.pos + self.dt * pred_v
        gw = self.gradW_coef(r)
        itr, err = 0, np.inf
        while itr < max_iter:
            # refine (PCISPH.py:110-125): star -> pressure -> temp p-acc ->
            # predict; the break tests the error measured at loop START
            Rp = pred_x[:, None, :] - pred_x[None, :, :]
            rp = np.sqrt(np.sum(Rp * Rp, axis=-1))
            ratio = self.v0 * np.where(mask, self.W(rp), 0.0).sum(axis=1)
            star = ratio * self.rho0
            err = np.mean(np.maximum(ratio - 1.0, 0.0))
            pressure = np.maximum(pressure + k * (self.rho0 - star), 0.0)
            # temp pressure acceleration at ORIGINAL positions/densities
            # (PCISPH.py:74-107)
            p_rho2 = pressure / self.density ** 2
            term = np.where(mask, self.mass[None, :] *
                            (p_rho2[:, None] + p_rho2[None, :]) * gw, 0.0)
            p_acc = -np.einsum("ij,ijd->id", term, R)
            pred_v = self.vel + self.dt * (self.acc + p_acc)
            pred_x = self.pos + self.dt * pred_v
            itr += 1
            if err < eta:
                break
        self.pressure = pressure
        # tail = WCSPH procedure (PCISPH.py:172-185)
        self.vel += self.dt * self.acc
        self.acc = self.pressure_acceleration(R, r, mask)
        self.vel += self.dt * self.acc
        self.pos += self.dt * self.vel
        self.enforce_boundary()
        return itr, err

    # ---- IISPH -------------------------------------------------------------
    def step_iisph(self, eta=1e-3, omega=0.2, max_iter=20):
        """One IISPH step (IISPH.py:203-228). Returns (iters, err).
        Fluid-only, so the stale-advected-density rigid quirk never fires."""
        R, r, mask = self._pairs()
        self.compute_density(R, r, mask)
        self.non_pressure_acceleration(R, r, mask)
        self.vel += self.dt * self.acc
        gw = self.gradW_coef(r)
        gR = gw[:, :, None] * R                    # nabla_ij
        rho0v = self.rho0 * self.v0
        # d_ii (IISPH.py:17-44, fluid branch)
        c_dii = np.where(mask, -rho0v * gw / self.density[None, :] ** 2, 0.0)
        dii = np.einsum("ij,ijd->id", c_dii, R)
        # a_ii (IISPH.py:46-68): dt^2 sum_j rho0 V_j (d_ii - d_ji).nabla_ij
        dpi = rho0v / self.density ** 2            # d_ji = dpi_i * nabla_ij
        gg = np.einsum("ijd,ijd->ij", gR, gR)
        term = np.einsum("id,ijd->ij", dii, gR) - dpi[:, None] * gg
        aii = self.dt ** 2 * np.sum(np.where(mask, rho0v * term, 0.0), axis=1)
        # advected density (IISPH.py:70-90)
        dvR = np.einsum("ijd,ijd->ij", self.vel[:, None] - self.vel[None, :], R)
        star = self.density + self.dt * np.sum(
            np.where(mask, rho0v * dvR * gw, 0.0), axis=1)
        si = self.rho0 - star
        pressure = np.zeros(self.n)
        itr, err = 0, np.inf
        while itr < max_iter:
            # refine (IISPH.py:185-200): dij_pj -> sum_i -> update_pressure
            c = np.where(mask, -rho0v * gw / self.density[None, :] ** 2 *
                         pressure[None, :], 0.0)
            dij_pj = np.einsum("ij,ijd->id", c, R)
            # sum_i (IISPH.py:147-182, fluid branch)
            inner = (dij_pj[:, None, :]
                     - dii[None, :, :] * pressure[None, :, None]
                     - dij_pj[None, :, :]
                     + dpi[:, None, None] * gR * pressure[:, None, None])
            s = np.einsum("ijd,ijd->ij", inner, gR)
            sum_i = self.dt ** 2 * np.sum(np.where(mask, rho0v * s, 0.0), axis=1)
            # update_pressure (IISPH.py:97-122); err is SIGNED like the ref
            can = np.abs(aii) > 1e-10
            new_p = (1.0 - omega) * pressure + \
                omega / np.where(can, aii, 1.0) * (si - sum_i)
            new_p = np.where(can, np.maximum(new_p, 0.0), 0.0)
            pressure = new_p
            resid = np.where(new_p > 1e-10, aii * new_p + sum_i - si, 0.0)
            err = resid.sum() / self.n / self.rho0
            itr += 1
            if err < eta:
                break
        self.pressure = pressure
        self.acc = self.pressure_acceleration(R, r, mask)
        self.vel += self.dt * self.acc
        self.pos += self.dt * self.vel
        self.enforce_boundary()
        return itr, err

    # ---- PBF ---------------------------------------------------------------
    def step_pbf(self, iters=5, corr_k=0.001, corr_dq=0.3, lambda_eps=100.0):
        """One PBF step (PBF.py:145-158). Construct with kernel="poly6".

        Densities carry across steps (the step never recomputes them before
        the viscosity pass — PBF.py:147 runs on the values the previous
        refine left behind). Candidacy is the step-start grid; distances are
        re-tested at the moved positions every refine iteration.
        """
        assert self.kernel == "poly6"
        R, r, mask = self._pairs()
        self.non_pressure_acceleration(R, r, mask)
        self.vel += self.dt * self.acc
        old_pos = self.pos.copy()
        self.pos = self.pos + self.dt * self.vel
        self.enforce_boundary()
        w_dq = float(self.W(corr_dq * self.h))
        eye = np.eye(self.n, dtype=bool)
        for _ in range(iters):                     # fixed 5 (PBF.py:61-65)
            Rm = self.pos[:, None, :] - self.pos[None, :, :]
            rm = np.sqrt(np.sum(Rm * Rm, axis=-1))
            mm = (rm < self.h) & ~eye
            # compute_density with the poly6 override: W(0) == 0, so the
            # self term vanishes (base_solver.py:521-541 + PBF.py:27)
            self.density = self.rho0 * self.v0 * (
                np.where(mm, self.W(rm), 0.0).sum(axis=1))
            # lambda (PBF.py:68-101, fluid branch)
            gwm = self.gradW_coef(rm)
            w = np.where(mm, self.mass[None, :] / self.rho0 * gwm, 0.0)
            vec = np.einsum("ij,ijd->id", w, Rm)
            sum_sq = np.sum(w * w * rm * rm, axis=1)
            denom = sum_sq + np.sum(vec * vec, axis=-1) + lambda_eps
            lam = -(self.density / self.rho0 - 1.0) / denom   # unclamped
            # fix_position (PBF.py:104-131)
            ratio = np.where(mm, self.W(rm), 0.0) / w_dq
            scorr = -corr_k * ratio ** 4
            coef = np.where(mm, (lam[:, None] + lam[None, :] + scorr) *
                            self.mass[None, :] * gwm, 0.0)
            self.pos = self.pos + np.einsum("ij,ijd->id", coef, Rm) / self.rho0
        self.enforce_boundary()
        self.vel = (self.pos - old_pos) / self.dt

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
