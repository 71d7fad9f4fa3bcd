"""Head-to-head: fused Pallas MPC kernel vs the XLA condense+ADMM path
at walking shapes on the current backend."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.core.config import ControllerConfig
from mpc_limx_control_tpu.models import srbd
from mpc_limx_control_tpu.ops import condense as cnd
from mpc_limx_control_tpu.ops import mpc_fused_pallas as fused
from mpc_limx_control_tpu.ops import qp as qps


def timeit(fn, *args, iters=10):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]
    return (time.perf_counter() - t0) / iters


def main():
    dev = jax.devices()[0]
    B = int(os.environ.get("BENCH_BATCH",
                           4096 if dev.platform != "cpu" else 256))
    cfg = ControllerConfig.walking()
    c = cfg.srbd
    N = c.horizon
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    pos = jnp.asarray([0.0, 0.0, 0.65], jnp.float32) + \
        0.02 * jax.random.normal(k1, (B, 3), jnp.float32)
    yaw = 0.1 * jax.random.normal(k2, (B,), jnp.float32)
    arms = pos[:, None, :] + jnp.asarray([0.02, 0.1, -0.65]) + \
        0.03 * jax.random.normal(k3, (B, N, 3), jnp.float32)
    Ac, Bc_t = jax.vmap(
        lambda a, p, y: srbd.linearize_shared(cfg.robot, a, p, y,
                                              jnp.float32))(arms, pos, yaw)
    Ad, Bd_t = srbd.discretize_srbd(Ac, Bc_t, c.ts)
    xi0 = jax.vmap(srbd.initial_state)(
        jnp.zeros((B, 3)), pos, jnp.zeros((B, 3)),
        jnp.asarray([0.4, 0.0, 0.0]) + jnp.zeros((B, 3)))
    v_des = jnp.broadcast_to(jnp.asarray([0.5, 0.0, 0.0]), (B, 3))
    x_ref = jax.vmap(lambda x, v: srbd.walking_reference(
        x, c, N, v, jnp.zeros(()), height_des=0.65))(xi0, v_des)
    z_w = jnp.zeros((B, 3 * N), jnp.float32)
    y_w = jnp.zeros((B, 6 * N), jnp.float32)
    Ad = Ad.astype(jnp.float32)
    Bd_t = Bd_t.astype(jnp.float32)
    x_ref = x_ref.astype(jnp.float32)
    xi0 = xi0.astype(jnp.float32)

    # ---- current XLA path: condense + warm ADMM (pallas chol) --------
    Q = jnp.diag(jnp.asarray(c.q_diag, jnp.float32))
    R = jnp.diag(jnp.asarray(c.r_diag, jnp.float32))
    P = c.p_scale * Q
    G, h = srbd.friction_cone_rows(c, N, jnp.float32)
    solver = qps.make_admm_warm(iters=c.solver.admm_warm_iters,
                                rho=c.solver.admm_rho,
                                alpha=c.solver.admm_alpha)

    @jax.jit
    def xla_path(Ad, Bd_t, x_ref, xi0, z_w, y_w):
        def one(a, b, xr, x0, z, y):
            qp = cnd.condense(a, b, Q, R, P, N, x0, xr, None, None,
                              extra_G=G, extra_h=h)
            sol, zy = solver(qp.H, qp.f, qp.G, qp.h, z, y)
            return sol.u, zy
        u, zy = jax.vmap(one)(Ad, Bd_t, x_ref, xi0, z_w, y_w)
        return u.sum()

    t_xla = timeit(xla_path, Ad, Bd_t, x_ref, xi0, z_w, y_w)

    # ---- fused pallas kernel ------------------------------------------
    fsolver = fused.make_admm_fused(c)

    @jax.jit
    def fused_path(Ad, Bd_t, x_ref, xi0, z_w, y_w):
        sol, zy = jax.vmap(fsolver)(Ad, Bd_t, x_ref, xi0, z_w, y_w)
        return sol.u.sum()

    t0 = time.perf_counter()
    t_fused = timeit(fused_path, Ad, Bd_t, x_ref, xi0, z_w, y_w)
    print(f"(fused compile+run window: {time.perf_counter()-t0:.1f}s)")

    # numerical agreement on-device
    @jax.jit
    def both(Ad, Bd_t, x_ref, xi0, z_w, y_w):
        def one(a, b, xr, x0, z, y):
            qp = cnd.condense(a, b, Q, R, P, N, x0, xr, None, None,
                              extra_G=G, extra_h=h)
            sol, zy = solver(qp.H, qp.f, qp.G, qp.h, z, y)
            return sol.u
        u_ref = jax.vmap(one)(Ad, Bd_t, x_ref, xi0, z_w, y_w)
        sol_f, _ = jax.vmap(fsolver)(Ad, Bd_t, x_ref, xi0, z_w, y_w)
        err = jnp.max(jnp.abs(u_ref - sol_f.u))
        scale = jnp.max(jnp.abs(u_ref))
        return err, scale

    err, scale = both(Ad, Bd_t, x_ref, xi0, z_w, y_w)
    print(f"B={B} device={dev}")
    print(f"XLA condense+ADMM : {t_xla*1e3:8.2f} ms")
    print(f"fused pallas      : {t_fused*1e3:8.2f} ms "
          f"({t_xla/t_fused:.1f}x)")
    print(f"max |u_ref-u_fused| = {float(err):.4f} "
          f"(scale {float(scale):.1f})")


if __name__ == "__main__":
    main()
