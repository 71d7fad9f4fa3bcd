"""Planar double-integrator model — the reference's solver oracle scenario.

Capability parity with src/linear_mpc_example.cpp:16-22,110-117 and
src/qpSolver_test.cpp:8-24: a 2D point mass with damping, NX=4 (x, vx, y,
vy), NU=2, tracking a circle of radius 2 at 0.5 rad/s over a 500-step
closed loop.
"""

from __future__ import annotations

import jax.numpy as jnp


def continuous_matrices(dtype=jnp.float32):
    """(Ac, Bc): damping/mass = 0.1, input gain 1/mass = 5
    (src/linear_mpc_example.cpp:17-18 with damping=0.02, mass=0.2)."""
    Ac = jnp.array([
        [0.0, 1.0, 0.0, 0.0],
        [0.0, -0.1, 0.0, 0.0],
        [0.0, 0.0, 0.0, 1.0],
        [0.0, 0.0, 0.0, -0.1],
    ], dtype)
    Bc = jnp.array([
        [0.0, 0.0],
        [5.0, 0.0],
        [0.0, 0.0],
        [0.0, 5.0],
    ], dtype)
    return Ac, Bc


def circle_reference(k, ts: float, N: int, radius: float = 2.0,
                     angular_vel: float = 0.5, dtype=jnp.float32):
    """Reference trajectory [N+1, nx] at closed-loop step k
    (src/qpSolver_test.cpp:40-50).  `k` may be a traced scalar."""
    i = jnp.arange(N + 1, dtype=dtype)
    t = (k + i) * ts
    theta = angular_vel * t
    return jnp.stack([
        radius * jnp.cos(theta),
        -radius * angular_vel * jnp.sin(theta),
        radius * jnp.sin(theta),
        radius * angular_vel * jnp.cos(theta),
    ], axis=-1)
