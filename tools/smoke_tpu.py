"""Real-backend Pallas smoke: trace + compile + run ONE batched tick of
every kernel variant on the actual chip (no interpreter).

Round 3 shipped a kernel that passed nothing but its author's intent:
the in-kernel KF captured two NumPy constants that the Pallas TPU
lowering rejects at trace time, and the only real-backend validation —
the bench quality gate — was the thing that crashed.  This tool is the
snapshot gate that kills that failure class: it exercises each Pallas
program on the REAL backend in under a minute, so "interpret-mode tests
pass" can never again stand in for "the kernel compiles on TPU".

Rule (NOTES.md): no end-of-round snapshot without
  pytest green  +  `python tools/smoke_tpu.py` green  +  `python
  bench.py` rc=0
at HEAD.

Checks (each = trace, compile, run, assert finite):
  1. walking truth-mode whole-tick kernel   (ops/tick_fused_pallas.py)
  2. walking KF-mode whole-tick kernel      (in-kernel 12-state filter)
  3. standing two-foot fused tick           (whole-tick stand kernel,
     falls back to the two-foot fused QP if the config is unsupported)
  4. fused walking QP prep kernel           (ops/mpc_fused_pallas.py)
  5. chol_pallas posdef_solve_fast          (ops/chol_pallas.py)

Exit code 0 = all green; any trace/compile/run error propagates.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

# persistent compile cache: repeat smoke runs skip the ~5 min of Mosaic
# compiles (cache keys include the kernel source, so a kernel edit still
# recompiles)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def _finite(name, *arrays):
    for a in arrays:
        arr = np.asarray(a)
        if not np.isfinite(arr).all():
            raise SystemExit(f"SMOKE FAIL [{name}]: non-finite output")


def _tick_smoke(name, cfg, B=256, steps=3):
    """Compile + run `steps` fused ticks at batch B on the real backend;
    assert the fused dispatch is actually taken and outputs are finite."""
    from mpc_limx_control_tpu.control import rollout as ro

    state = ro.initial_plant_state(cfg, batch=(B,))
    assert ro._use_fused_tick(cfg, state), \
        f"SMOKE FAIL [{name}]: config does not dispatch the fused kernel"
    t0 = time.perf_counter()
    for j in range(steps):
        its = jnp.full((B,), float(j), jnp.float32)
        state, metrics = jax.vmap(
            lambda s, it: ro.plant_step(cfg, s, it))(state, its)
    _finite(name, state.xi, state.q, metrics["grf"],
            metrics["qp_residual"])
    if state.kf is not None:
        _finite(name, state.kf.x_hat, state.kf.p_cov)
    print(f"  ok {name:34s} ({time.perf_counter() - t0:6.1f}s "
          f"compile+run, B={B})")


def main():
    backend = jax.default_backend()
    print(f"backend: {backend} ({jax.devices()})")
    if backend != "tpu":
        print("SMOKE SKIP: no TPU backend — this gate must run on the "
              "real chip", file=sys.stderr)
        raise SystemExit(2)

    from mpc_limx_control_tpu.core.config import ControllerConfig

    t_all = time.perf_counter()

    # 1. walking truth-mode whole-tick kernel
    _tick_smoke("walking/truth fused tick", ControllerConfig.walking())

    # 2. walking KF-mode whole-tick kernel (in-kernel 12-state filter)
    _tick_smoke("walking/kf fused tick",
                dataclasses.replace(ControllerConfig.walking(),
                                    estimator_mode="kf"))

    # 2b. dtMPC HOLD variant: one solve tick + one held tick (the
    # grf_override path dispatches the no-MPC hold kernel)
    from mpc_limx_control_tpu.control import rollout as _ro
    cfg_h = ControllerConfig.walking()
    sh = _ro.initial_plant_state(cfg_h, batch=(256,))
    t0 = time.perf_counter()
    its = jnp.zeros((256,), jnp.float32)
    sh, mh = jax.vmap(lambda s, it: _ro.plant_step(cfg_h, s, it))(sh, its)
    sh, mh2 = jax.vmap(
        lambda s, it, g: _ro.plant_step(cfg_h, s, it, grf_override=g))(
        sh, its + 1.0, mh["grf"])
    _finite("hold tick", sh.xi, sh.q, mh2["grf"])
    assert float(np.abs(np.asarray(mh2["qp_residual"])).max()) == 0.0
    print(f"  ok {'walking dtMPC hold kernel':34s} "
          f"({time.perf_counter() - t0:6.1f}s compile+run, B=256)")

    # 3. standing: whole-tick stand kernel when supported (truth AND
    # in-kernel-KF variants), else the two-foot fused QP session path
    from mpc_limx_control_tpu.control import rollout as ro
    cfg_s = ControllerConfig.standing()
    st = ro.initial_plant_state(cfg_s, batch=(256,))
    if ro._use_fused_tick(cfg_s, st):
        _tick_smoke("standing fused tick", cfg_s)
        _tick_smoke("standing/kf fused tick",
                    dataclasses.replace(cfg_s, estimator_mode="kf"))
    else:
        t0 = time.perf_counter()
        for j in range(3):
            its = jnp.full((256,), float(j), jnp.float32)
            st, m = jax.vmap(
                lambda s, it: ro.plant_step(cfg_s, s, it))(st, its)
        _finite("standing tick", st.xi, st.q, m["grf"])
        print(f"  ok {'standing tick (two-foot fused QP)':34s} "
              f"({time.perf_counter() - t0:6.1f}s compile+run, B=256)")

    # 4. fused walking QP prep kernel, called directly
    from mpc_limx_control_tpu.ops import mpc_fused_pallas as fqp
    cfg = ControllerConfig.walking()
    solver = fqp.make_walking_fused(cfg)
    B = 256
    key = jax.random.PRNGKey(0)
    N = cfg.srbd.horizon
    arms = jnp.zeros((B, N, 3), jnp.float32)
    xi0 = jnp.zeros((B, 13), jnp.float32).at[:, 5].set(0.65)
    xi0 = xi0.at[:, 12].set(-9.81)
    vd = jnp.tile(jnp.asarray([[0.5, 0.0, 0.0]], jnp.float32), (B, 1))
    wd = jnp.zeros((B,), jnp.float32)
    zw = jnp.zeros((B, N * 3), jnp.float32)
    yw = jnp.zeros((B, N * 6), jnp.float32)
    anc = jnp.concatenate([xi0[:, 3:5], xi0[:, 2:3]], -1)
    t0 = time.perf_counter()
    sol, xp, qp_state = jax.vmap(
        lambda *a: solver(*a))(arms, xi0, vd, wd, zw, yw, anc)
    _finite("fused walking qp", sol.u, sol.residual, xp)
    print(f"  ok {'fused walking QP prep kernel':34s} "
          f"({time.perf_counter() - t0:6.1f}s compile+run, B={B})")

    # 5. chol_pallas fast posdef solve
    from mpc_limx_control_tpu.ops import chol_pallas as cp
    n = 60
    A = jax.random.normal(key, (B, n, n), jnp.float32)
    M = jnp.einsum("bij,bkj->bik", A, A) + 10.0 * jnp.eye(n)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (B, n, 2), jnp.float32)
    t0 = time.perf_counter()
    x = cp.posdef_solve_fast(M, rhs)
    _finite("chol_pallas", x)
    # accuracy vs a float64 HOST solve of the same M — NOT an on-device
    # einsum residual: default-precision TPU matmuls run bf16 on the
    # MXU, so an einsum-recomputed Mx check measures the checker, not
    # the kernel (measured: kernel 2e-7, bf16 residual check 6e-2)
    x_ref = np.linalg.solve(np.asarray(M, np.float64), np.asarray(rhs))
    err = float(np.abs(np.asarray(x) - x_ref).max()
                / (1.0 + np.abs(x_ref).max()))
    if err > 1e-4:
        raise SystemExit(f"SMOKE FAIL [chol_pallas]: rel err {err}")
    print(f"  ok {'chol_pallas posdef_solve_fast':34s} "
          f"({time.perf_counter() - t0:6.1f}s compile+run, B={B}, "
          f"residual {err:.2e})")

    print(f"SMOKE GREEN in {time.perf_counter() - t_all:.1f}s")


if __name__ == "__main__":
    main()
