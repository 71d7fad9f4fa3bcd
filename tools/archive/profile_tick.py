"""Stage-level profile of the batched walking tick on the current backend.

Decomposes the ~42 ms (B=4096) full plant_step into:
  rest   — gait, placement, FK, swing IK, plant dynamics, packing
           (measured as plant_step with grf_override, i.e. MPC skipped)
  cond   — SRBD linearize + ZOH + dense condensation (H, f, G, h)
  qp     — warm-ADMM GRF solve on prebuilt (H, f, G, h, warm state)
  full   — the whole tick (cross-check: full ≈ rest + cond + qp)

Methodology per NOTES.md: host fetch (np.asarray) of a scalar to time —
block_until_ready can return early on the tunneled backend; keep outputs
scalar so the ~50 MB/s tunnel is not measured.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.control import rollout as ro
from mpc_limx_control_tpu.control import gait as gaitmod
from mpc_limx_control_tpu.models import srbd
from mpc_limx_control_tpu.ops import condense as cnd
from mpc_limx_control_tpu.ops import qp as qps


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])          # compile + settle
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    cfg = ControllerConfig.walking()
    dev = jax.devices()[0]
    B = int(os.environ.get("BENCH_BATCH",
                           4096 if dev.platform != "cpu" else 256))
    N = cfg.srbd.horizon
    state0 = ro.initial_plant_state(cfg, batch=(B,))
    key = jax.random.PRNGKey(0)
    state0 = state0.replace(xi=state0.xi.at[:, 9].add(
        0.05 * jax.random.normal(key, (B,), jnp.float32)))
    it0 = jnp.asarray(5.0, jnp.float32)

    # ---- full tick ----
    @jax.jit
    def full(state):
        s, m = jax.vmap(lambda s: ro.plant_step(cfg, s, it0))(state)
        return s.xi.sum()

    t_full = timeit(full, state0)

    # ---- rest (MPC skipped via grf_override) ----
    grf0 = jnp.zeros((B, 6), jnp.float32)

    @jax.jit
    def rest(state, grf):
        s, m = jax.vmap(
            lambda s, g: ro.plant_step(cfg, s, it0, grf_override=g))(
            state, grf)
        return s.xi.sum()

    t_rest = timeit(rest, state0, grf0)

    # ---- condensation-only on representative inputs ----
    def cond_inputs(state):
        xi0 = state.xi
        yaw = xi0[..., 2]
        sched = gaitmod.contact_schedule(cfg.gait, it0, N, cfg.srbd.ts)
        on_l = jnp.broadcast_to(sched.astype(jnp.float32), (B, N))
        arms = jnp.where(on_l[..., None] > 0.5,
                         state.foot_l[:, None], state.foot_r[:, None])
        Ac, Bc_t = srbd.linearize_shared(cfg.robot, arms, xi0[..., 3:6],
                                         yaw, jnp.float32)
        Ad, Bd_t = srbd.discretize_srbd(Ac, Bc_t, cfg.srbd.ts)
        x_ref = srbd.walking_reference(
            xi0, cfg.srbd, N,
            jnp.broadcast_to(jnp.asarray(cfg.desired_velocity), (B, 3)),
            jnp.zeros((B,)), height_des=cfg.base_height)
        return Ad, Bd_t, x_ref, xi0

    Ad, Bd_t, x_ref, xi0 = jax.jit(cond_inputs)(state0)
    Q = jnp.diag(jnp.asarray(cfg.srbd.q_diag, jnp.float32))
    R = jnp.diag(jnp.asarray(cfg.srbd.r_diag, jnp.float32))
    P = cfg.srbd.p_scale * Q
    Gu = jnp.asarray([[1., 0., -cfg.srbd.friction_mu],
                      [-1., 0., -cfg.srbd.friction_mu],
                      [0., 1., -cfg.srbd.friction_mu],
                      [0., -1., -cfg.srbd.friction_mu],
                      [0., 0., 1.], [0., 0., -1.]], jnp.float32)
    G1 = jnp.kron(jnp.eye(N, dtype=jnp.float32), Gu)
    hu = jnp.asarray([0., 0., 0., 0., cfg.srbd.fz_max, -cfg.srbd.fz_min],
                     jnp.float32)
    h1 = jnp.tile(hu, N)

    @jax.jit
    def cond(Ad, Bd_t, x_ref, xi0):
        qp = jax.vmap(lambda a, b, xr, x0: cnd.condense(
            a, b, Q, R, P, N, x0, xr, None, None,
            extra_G=G1, extra_h=h1))(Ad, Bd_t, x_ref, xi0)
        return qp.H.sum() + qp.f.sum()

    t_cond = timeit(cond, Ad, Bd_t, x_ref, xi0)

    # ---- qp-only on prebuilt condensed problems ----
    qp_all = jax.jit(jax.vmap(lambda a, b, xr, x0: cnd.condense(
        a, b, Q, R, P, N, x0, xr, None, None,
        extra_G=G1, extra_h=h1)))(Ad, Bd_t, x_ref, xi0)
    z0 = jnp.zeros((B, 3 * N), jnp.float32)
    y0 = jnp.zeros((B, 6 * N), jnp.float32)
    solver = qps.make_admm_warm(iters=cfg.srbd.solver.admm_warm_iters,
                                rho=cfg.srbd.solver.admm_rho,
                                alpha=cfg.srbd.solver.admm_alpha)

    @jax.jit
    def qp_only(H, f, G, h, z, y):
        sol, zy = jax.vmap(solver)(H, f, G, h, z, y)
        return sol.u.sum()

    t_qp = timeit(qp_only, qp_all.H, qp_all.f, qp_all.G, qp_all.h, z0, y0)

    print(f"B={B} device={dev}")
    print(f"full tick        : {t_full*1e3:8.2f} ms "
          f"({B/t_full:,.0f} solves/s)")
    print(f"rest (no MPC)    : {t_rest*1e3:8.2f} ms "
          f"({100*t_rest/t_full:.0f}%)")
    print(f"condensation     : {t_cond*1e3:8.2f} ms "
          f"({100*t_cond/t_full:.0f}%)")
    print(f"qp (warm ADMM)   : {t_qp*1e3:8.2f} ms "
          f"({100*t_qp/t_full:.0f}%)")
    print(f"sum of stages    : {(t_rest+t_cond+t_qp)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
