"""Condensation: prediction matrices and dense QP formation.

TPU-native re-design of `QPSolver::buildQPParams` (reference
src/QPSolver.cpp:31-81).  The reference builds A_aug / B_aug with nested
Python-style loops and `Ad.pow`; here both are produced by a single
`lax.scan` over the horizon (O(N) sequential steps of batched matmuls), which
XLA unrolls/fuses into MXU work, and the whole pipeline generalizes to
time-varying (Ad_t, Bd_t) — required for contact-scheduled SRBD MPC, where B
switches with the gait (capability the reference's single-support `mpcQP`
only gestures at).

Shapes (single scenario; batch via vmap):
    Ad [nx,nx] or [N,nx,nx]      Bd [nx,nu] or [N,nx,nu]
    A_blocks [N+1,nx,nx]         A_blocks[i] = Ad_{i-1}...Ad_0
    B_blocks [N+1,N,nx,nu]       B_blocks[i,j] = Ad_{i-1}..Ad_{j+1} Bd_j, j<i
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class CondensedQP(NamedTuple):
    """Dense condensed QP: min 1/2 z'Hz + f'z  s.t.  Gz <= h.

    H [nz,nz]; f [nz]; G [m,nz]; h [m]  (nz = N*nu).
    `A_blocks`/`B_blocks` are kept for state reconstruction and diagnostics.
    """

    H: jnp.ndarray
    f: jnp.ndarray
    G: jnp.ndarray
    h: jnp.ndarray
    A_blocks: jnp.ndarray
    B_blocks: jnp.ndarray


def prediction_matrices(Ad: jnp.ndarray, Bd: jnp.ndarray, N: int):
    """Build (A_blocks [N+1,nx,nx], B_blocks [N+1,N,nx,nu]) by scan.

    Accepts LTI ([nx,nx]) or LTV ([N,nx,nx]) inputs.  Equivalent to the
    reference's power form (src/QPSolver.cpp:36-47) when LTI.
    """
    nx = Ad.shape[-1]
    nu = Bd.shape[-1]
    dtype = Ad.dtype
    if Ad.ndim == 2:
        Ad = jnp.broadcast_to(Ad, (N, nx, nx))
    if Bd.ndim == 2:
        Bd = jnp.broadcast_to(Bd, (N, nx, nu))

    eye = jnp.eye(nx, dtype=dtype)

    def step_a(phi, a_t):
        phi_next = a_t @ phi
        return phi_next, phi_next

    # full unroll: N is small (15-20) and the per-step matmuls are tiny;
    # unrolling lets XLA fuse the whole chain instead of paying scan
    # latency per step
    _, phis = lax.scan(step_a, eye, Ad, unroll=True)
    A_blocks = jnp.concatenate([eye[None], phis], axis=0)

    # Row recursion: G_i = Ad_{i-1} @ G_{i-1} + e_{i-1} (x) Bd_{i-1}.
    # G_{i-1}[i-1] is zero before its own injection, so the one-hot add is
    # exact (no dynamic-index update needed -> TPU friendly).
    onehot = jnp.eye(N, dtype=dtype)

    def step_b(g_prev, inp):
        a_t, b_t, e_t = inp
        g = jnp.einsum("xy,nyu->nxu", a_t, g_prev)
        g = g + e_t[:, None, None] * b_t[None]
        return g, g

    g0 = jnp.zeros((N, nx, nu), dtype)
    _, rows = lax.scan(step_b, g0, (Ad, Bd, onehot), unroll=True)
    B_blocks = jnp.concatenate([g0[None], rows], axis=0)
    return A_blocks, B_blocks


def _flatten_b(B_blocks: jnp.ndarray) -> jnp.ndarray:
    """[N+1,N,nx,nu] -> [(N+1)*nx, N*nu] dense prediction matrix."""
    n1, N, nx, nu = B_blocks.shape
    return B_blocks.transpose(0, 2, 1, 3).reshape(n1 * nx, N * nu)


def condense(
    Ad: jnp.ndarray,
    Bd: jnp.ndarray,
    Q: jnp.ndarray,
    R: jnp.ndarray,
    P: jnp.ndarray,
    N: int,
    x0: jnp.ndarray,
    x_ref: jnp.ndarray,
    u_min: float,
    u_max: float,
    x_min: Optional[jnp.ndarray] = None,
    x_max: Optional[jnp.ndarray] = None,
    extra_G: Optional[jnp.ndarray] = None,
    extra_h: Optional[jnp.ndarray] = None,
) -> CondensedQP:
    """Form the condensed QP for one scenario.

    x_ref is [N+1, nx] (row i = reference state at step i; the reference
    stores the transpose and flattens column-major, src/QPSolver.cpp:59 —
    identical vector).  Cost H = 2(B'Q̄B + R̄),
    f = 2 B'Q̄(A_aug x0 - x_ref_vec) (src/QPSolver.cpp:58-60).

    Constraints assembled as G z <= h:
      * input box (src/QPSolver.cpp:67-68)
      * state box through prediction rows 1..N (src/QPSolver.cpp:71-80)
      * optional extra rows (friction cones...): extra_G [me, N*nu].

    The reference's over-determined "equality constraints"
    (src/QPSolver.cpp:63-64) are intentionally dropped — see
    oracle/qp_oracle.py for why they cannot be honored.
    """
    nx = Ad.shape[-1]
    nu = Bd.shape[-1]
    dtype = x0.dtype
    A_blocks, B_blocks = prediction_matrices(Ad, Bd, N)
    B_mat = _flatten_b(B_blocks)                       # [(N+1)nx, Nnu]
    nz = N * nu

    # Block-diagonal cost application without materializing Q_bar.
    Qs = jnp.concatenate(
        [jnp.broadcast_to(Q, (N, nx, nx)), P[None]], axis=0)  # [N+1,nx,nx]
    B_rows = B_mat.reshape(N + 1, nx, nz)
    QB = jnp.einsum("ixy,iyz->ixz", Qs, B_rows).reshape((N + 1) * nx, nz)
    R_bar = jnp.kron(jnp.eye(N, dtype=dtype), R)
    H = 2.0 * (B_mat.T @ QB + R_bar)
    H = 0.5 * (H + H.T)

    x_pred_free = (A_blocks @ x0).reshape(-1)          # A_aug x0, [(N+1)nx]
    err = x_pred_free - x_ref.reshape(-1)
    f = 2.0 * (QB.T @ err)

    G_parts = []
    h_parts = []
    if u_min is not None:
        eye_z = jnp.eye(nz, dtype=dtype)
        G_parts += [eye_z, -eye_z]
        h_parts += [jnp.full((nz,), u_max, dtype),
                    jnp.full((nz,), -u_min, dtype)]

    if x_min is not None:
        B_pred = B_mat[nx:]                            # states 1..N
        xf = x_pred_free[nx:]
        x_max_t = jnp.tile(jnp.asarray(x_max, dtype), N)
        x_min_t = jnp.tile(jnp.asarray(x_min, dtype), N)
        G_parts += [B_pred, -B_pred]
        h_parts += [x_max_t - xf, -(x_min_t - xf)]

    if extra_G is not None:
        G_parts.append(extra_G)
        h_parts.append(extra_h)

    G = jnp.concatenate(G_parts, axis=0)
    h = jnp.concatenate(h_parts, axis=0)
    return CondensedQP(H=H, f=f, G=G, h=h,
                       A_blocks=A_blocks, B_blocks=B_blocks)


class CondensationCache(NamedTuple):
    """Per-(Ad,Bd) precomputation for LTI MPC: everything that does not
    depend on (x0, x_ref).  The reference rebuilds all of this every control
    step (src/QPSolver.cpp:31-60); caching it leaves only two small matvecs
    per tick on the device.

    A_blocks [N+1,nx,nx]; B_mat [(N+1)nx, nz]; QB [(N+1)nx, nz];
    H [nz,nz]; G [m,nz] (constraint matrix, constant for box+state rows).
    """

    A_blocks: jnp.ndarray
    B_mat: jnp.ndarray
    QB: jnp.ndarray
    H: jnp.ndarray
    G: jnp.ndarray
    N: int
    nx: int
    nu: int


def condense_cache(Ad, Bd, Q, R, P, N, with_state_rows: bool = True,
                   extra_G: Optional[jnp.ndarray] = None) -> CondensationCache:
    """Precompute the x0-independent parts of the condensed QP."""
    nx = Ad.shape[-1]
    nu = Bd.shape[-1]
    dtype = Ad.dtype
    A_blocks, B_blocks = prediction_matrices(Ad, Bd, N)
    B_mat = _flatten_b(B_blocks)
    nz = N * nu
    Qs = jnp.concatenate(
        [jnp.broadcast_to(Q, (N, nx, nx)), P[None]], axis=0)
    B_rows = B_mat.reshape(N + 1, nx, nz)
    QB = jnp.einsum("ixy,iyz->ixz", Qs, B_rows).reshape((N + 1) * nx, nz)
    R_bar = jnp.kron(jnp.eye(N, dtype=dtype), R)
    H = 2.0 * (B_mat.T @ QB + R_bar)
    H = 0.5 * (H + H.T)

    eye_z = jnp.eye(nz, dtype=dtype)
    G_parts = [eye_z, -eye_z]
    if with_state_rows:
        G_parts += [B_mat[nx:], -B_mat[nx:]]
    if extra_G is not None:
        G_parts.append(extra_G)
    G = jnp.concatenate(G_parts, axis=0)
    return CondensationCache(A_blocks=A_blocks, B_mat=B_mat, QB=QB, H=H,
                             G=G, N=N, nx=nx, nu=nu)


def linear_terms(cache: CondensationCache, x0, x_ref, u_min, u_max,
                 x_min=None, x_max=None, extra_h=None):
    """Per-tick linear pieces (f, h) for the cached condensation.

    x_ref is [N+1, nx].  Must pass x_min/x_max iff the cache was built with
    state rows, and extra_h iff it was built with extra_G.
    """
    N, nx, nu = cache.N, cache.nx, cache.nu
    dtype = x0.dtype
    nz = N * nu
    x_pred_free = (cache.A_blocks @ x0).reshape(-1)
    err = x_pred_free - x_ref.reshape(-1)
    f = 2.0 * (cache.QB.T @ err)

    h_parts = [jnp.full((nz,), u_max, dtype), jnp.full((nz,), -u_min, dtype)]
    if x_min is not None:
        xf = x_pred_free[nx:]
        x_max_t = jnp.tile(jnp.asarray(x_max, dtype), N)
        x_min_t = jnp.tile(jnp.asarray(x_min, dtype), N)
        h_parts += [x_max_t - xf, -(x_min_t - xf)]
    if extra_h is not None:
        h_parts.append(extra_h)
    return f, jnp.concatenate(h_parts, axis=0)


def predict_states(qp: CondensedQP, x0: jnp.ndarray,
                   z: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the predicted state trajectory [N+1, nx] from controls."""
    free = qp.A_blocks @ x0                             # [N+1, nx]
    forced = jnp.einsum("ijxu,ju->ix", qp.B_blocks,
                        z.reshape(qp.B_blocks.shape[1], -1))
    return free + forced
