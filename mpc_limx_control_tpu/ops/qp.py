"""Batched, branch-free QP solvers for TPU.

The reference solves each condensed MPC QP with qpOASES' dense active-set
method, nWSR = 50000 (src/QPSolver.cpp:83-106) — an inherently sequential,
branchy algorithm that cannot be batched on SIMD hardware.  The TPU engine
replaces it with two fixed-iteration, fully vectorized solvers over

    min_z 1/2 z' H z + f' z   s.t.   G z <= h

* :func:`pdip_qp` — primal-dual interior point with Mehrotra
  predictor-corrector, a fixed number of Newton steps under `lax.scan`.
  ~1e-6 relative accuracy in <=20 iterations in f32; f64 reaches 1e-10.
  One batched Cholesky of (H + G'DG) per step — the hot kernel.
* :func:`admm_qp` — over-relaxed ADMM with a single cached Cholesky factor
  of (H + rho G'G); cheapest per iteration and warm-startable across MPC
  ticks (the previous tick's solution shifts by one stage).

Both are pure functions of arrays: vmap for scenario batching, jit end to
end.  Accuracy is asserted against the float64 CPU oracle
(oracle/qp_oracle.py) in tests/test_qp.py.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from mpc_limx_control_tpu.core.types import QPSolution


def _posdef_chol(M: jnp.ndarray, reg: float) -> jnp.ndarray:
    n = M.shape[-1]
    return jnp.linalg.cholesky(M + reg * jnp.eye(n, dtype=M.dtype))


def _chol_solve(L: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    y = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)


def _max_step(v: jnp.ndarray, dv: jnp.ndarray) -> jnp.ndarray:
    """Largest alpha in (0,1] with v + alpha*dv >= 0, branch-free."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, jnp.min(ratio))


def ruiz_equilibrate(H: jnp.ndarray, f: jnp.ndarray, G: jnp.ndarray,
                     h: jnp.ndarray, iters: int = 6):
    """OSQP-style Ruiz equilibration of the QP.

    Returns (H', f', G', h', D) where the scaled problem in z' = D^{-1} z has
    H' = D H D, f' = D f, G' = E G D, h' = E h; after solving, u = D * z'.
    Drastically improves f32 conditioning of ill-scaled condensations.
    """
    n = f.shape[-1]
    m = h.shape[-1]
    D = jnp.ones((n,), H.dtype)
    E = jnp.ones((m,), H.dtype)
    floor = jnp.asarray(1e-8, H.dtype)

    def body(carry, _):
        D, E = carry
        Hs = jnp.abs(H) * D[:, None] * D[None, :]
        Gs = jnp.abs(G) * E[:, None] * D[None, :]
        col = jnp.maximum(jnp.max(Hs, axis=0), jnp.max(Gs, axis=0))
        D = D / jnp.sqrt(jnp.maximum(col, floor))
        Gs = jnp.abs(G) * E[:, None] * D[None, :]
        row = jnp.max(Gs, axis=1)
        E = E / jnp.sqrt(jnp.maximum(row, floor))
        return (D, E), None

    (D, E), _ = lax.scan(body, (D, E), None, length=iters)
    Hp = H * D[:, None] * D[None, :]
    fp = f * D
    Gp = G * E[:, None] * D[None, :]
    hp = h * E
    return Hp, fp, Gp, hp, D


@partial(jax.jit, static_argnames=("iters", "scale"))
def pdip_qp(H: jnp.ndarray, f: jnp.ndarray, G: jnp.ndarray, h: jnp.ndarray,
            iters: int = 20, scale: bool = False) -> QPSolution:
    """Fixed-iteration Mehrotra predictor-corrector IPM (single scenario).

    Batched use: `jax.vmap(lambda H,f,G,h: pdip_qp(H,f,G,h,iters))`.
    All control flow is a `lax.scan` of `iters` identical Newton steps;
    no data-dependent branching, so the whole solve fuses under jit.
    With `scale=True` the problem is Ruiz-equilibrated first (recommended
    in f32).
    """
    if scale:
        H, f, G, h, D_scale = ruiz_equilibrate(H, f, G, h)
    dtype = H.dtype
    n = f.shape[-1]
    m = h.shape[-1]
    eps = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-8, dtype)
    d_cap = jnp.asarray(1e14 if dtype == jnp.float64 else 1e7, dtype)
    reg = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)

    L_h = _posdef_chol(H, reg)
    z0 = -_chol_solve(L_h, f)
    s0_raw = h - G @ z0
    shift = jnp.maximum(0.0, -jnp.min(s0_raw)) + 1.0
    s0 = s0_raw + shift
    lam0 = jnp.ones((m,), dtype)
    f_scale = 1.0 + jnp.max(jnp.abs(f))
    mu0 = jnp.dot(s0, lam0) / m

    def merit_of(z, s, lam):
        r_dual = H @ z + f + G.T @ lam
        r_prim = jnp.maximum(G @ z - h, 0.0)
        mu = jnp.dot(s, lam) / m
        return (jnp.max(jnp.abs(r_dual)) / f_scale
                + jnp.max(r_prim)
                + mu / mu0)

    def newton_step(carry, _):
        z, s, lam, z_best, merit_best = carry
        r_dual = H @ z + f + G.T @ lam
        r_prim = G @ z + s - h
        mu = jnp.dot(s, lam) / m

        d = jnp.minimum(lam / jnp.maximum(s, eps), d_cap)
        M = H + (G.T * d) @ G
        L = _posdef_chol(M, reg)

        def direction(r_comp):
            rhs = -r_dual + G.T @ ((r_comp - lam * r_prim)
                                   / jnp.maximum(s, eps))
            dz = _chol_solve(L, rhs)
            ds = -r_prim - G @ dz
            dlam = -(r_comp + lam * ds) / jnp.maximum(s, eps)
            return dz, ds, dlam

        dz_a, ds_a, dlam_a = direction(s * lam)
        a_aff = jnp.minimum(_max_step(s, ds_a), _max_step(lam, dlam_a))
        mu_aff = jnp.dot(s + a_aff * ds_a, lam + a_aff * dlam_a) / m
        sigma = (mu_aff / jnp.maximum(mu, eps)) ** 3

        dz, ds, dlam = direction(s * lam - sigma * mu + ds_a * dlam_a)
        alpha = 0.99 * jnp.minimum(_max_step(s, ds), _max_step(lam, dlam))

        z = z + alpha * dz
        s = jnp.maximum(s + alpha * ds, eps)
        lam = jnp.maximum(lam + alpha * dlam, eps)

        merit = merit_of(z, s, lam)
        better = merit < merit_best
        z_best = jnp.where(better, z, z_best)
        merit_best = jnp.where(better, merit, merit_best)
        return (z, s, lam, z_best, merit_best), None

    init = (z0, s0, lam0, z0, merit_of(z0, s0, lam0))
    (z, s, lam, z_best, merit_best), _ = lax.scan(
        newton_step, init, None, length=iters)

    u = z_best * D_scale if scale else z_best
    return QPSolution(u=u, iterations=iters, residual=merit_best)


@partial(jax.jit, static_argnames=("iters",))
def admm_qp(H: jnp.ndarray, f: jnp.ndarray, G: jnp.ndarray, l: jnp.ndarray,
            u: jnp.ndarray, iters: int = 50, rho: float = 1.0,
            alpha: float = 1.6,
            z_warm: Optional[jnp.ndarray] = None,
            y_warm: Optional[jnp.ndarray] = None) -> QPSolution:
    """Over-relaxed ADMM for  min 1/2 z'Hz + f'z  s.t.  l <= Gz <= u.

    One Cholesky of (H + rho G'G) per solve; each iteration is two matvecs
    and a clip — the cheapest per-iteration batched solver, and warm-
    startable via (z_warm, y_warm) from the previous MPC tick.
    """
    dtype = H.dtype
    m = l.shape[-1]
    n = f.shape[-1]
    reg = jnp.asarray(1e-12 if dtype == jnp.float64 else 1e-6, dtype)

    K = H + rho * (G.T @ G)
    L = _posdef_chol(K, reg)

    z = jnp.zeros((n,), dtype) if z_warm is None else z_warm
    v = G @ z
    y = jnp.zeros((m,), dtype) if y_warm is None else y_warm

    def step(carry, _):
        z, v, y = carry
        rhs = -f + rho * (G.T @ (v - y))
        z_new = _chol_solve(L, rhs)
        gz = G @ z_new
        gz_relaxed = alpha * gz + (1.0 - alpha) * v
        v_new = jnp.clip(gz_relaxed + y, l, u)
        y_new = y + gz_relaxed - v_new
        return (z_new, v_new, y_new), None

    (z, v, y), _ = lax.scan(step, (z, v, y), None, length=iters)

    r_prim = jnp.max(jnp.abs(G @ z - v))
    residual = r_prim / (1.0 + jnp.max(jnp.abs(f)))
    return QPSolution(u=z, iterations=iters, residual=residual)
