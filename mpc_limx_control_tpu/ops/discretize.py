"""ZOH discretization of continuous-time LTI systems, jit/vmap friendly.

Capability parity with `QPSolver::discretizeSystem` (reference
src/QPSolver.cpp:21-29): stack M = [[Ac, Bc], [0, 0]], take expm(M*Ts) and
read off Ad (top-left) and Bd (top-right).  Two implementations:

* :func:`zoh` — `jax.scipy.linalg.expm` (Pade 13 + scaling-and-squaring),
  exact to machine precision in the working dtype; branch-free under jit.
* :func:`zoh_taylor` — fixed-order truncated Taylor series with a single
  static squaring count; cheaper inside per-step re-linearization loops where
  ||M*Ts|| << 1 (SRBD uses Ts = 1 ms, reference include/mpcQP.h:37).

Both batch over leading axes via vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _augment(Ac: jnp.ndarray, Bc: jnp.ndarray, ts: float) -> jnp.ndarray:
    nx, nu = Bc.shape[-2], Bc.shape[-1]
    top = jnp.concatenate([Ac, Bc], axis=-1)
    bot = jnp.zeros((*Ac.shape[:-2], nu, nx + nu), Ac.dtype)
    return jnp.concatenate([top, bot], axis=-2) * ts


def zoh(Ac: jnp.ndarray, Bc: jnp.ndarray, ts: float):
    """Exact ZOH: (Ad, Bd) = split(expm([[Ac,Bc],[0,0]] ts)).

    Accepts unbatched [nx,nx]/[nx,nu] or batched [..., nx, nx]/[..., nx, nu].
    """
    nx = Ac.shape[-1]
    M = _augment(Ac, Bc, ts)
    if M.ndim == 2:
        E = jax.scipy.linalg.expm(M)
    else:
        batch = M.shape[:-2]
        flat = M.reshape((-1, *M.shape[-2:]))
        E = jax.vmap(jax.scipy.linalg.expm)(flat).reshape(
            (*batch, *M.shape[-2:]))
    return E[..., :nx, :nx], E[..., :nx, nx:]


def zoh_taylor(Ac: jnp.ndarray, Bc: jnp.ndarray, ts: float,
               order: int = 8, squarings: int = 4):
    """Fixed-order ZOH: expm via Taylor(order) on M*ts/2^squarings, then
    `squarings` repeated squarings.  Static control flow only -> fuses into
    surrounding jitted code with no cond/while; ideal when ||Ac ts|| is small
    (error ~ (||M||ts/2^s)^(order+1)/(order+1)!).
    """
    nx = Ac.shape[-1]
    M = _augment(Ac, Bc, ts) / (2.0 ** squarings)
    eye = jnp.broadcast_to(jnp.eye(M.shape[-1], dtype=M.dtype), M.shape)
    E = eye
    term = eye
    for k in range(1, order + 1):
        term = jnp.matmul(term, M) / k
        E = E + term
    for _ in range(squarings):
        E = jnp.matmul(E, E)
    return E[..., :nx, :nx], E[..., :nx, nx:]
