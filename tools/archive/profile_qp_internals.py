"""Micro-profile of the warm-ADMM internals and condensation internals at
walking shapes (B=4096, n=60, m=120, N=20, nx=13, nu=3)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mpc_limx_control_tpu.ops import chol_pallas
from mpc_limx_control_tpu.ops import condense as cnd


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
    n, m, N, nx, nu = 60, 120, 20, 13, 3
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (B, n, n), jnp.float32)
    K = jnp.matmul(A, jnp.swapaxes(A, -1, -2)) + 10.0 * jnp.eye(n)
    Gm = jax.random.normal(key, (B, m, n), jnp.float32)
    eye = jnp.eye(n, dtype=jnp.float32)

    t_chol = timeit(jax.jit(lambda K: chol_pallas.cholesky(K).sum()), K)
    L = jax.jit(chol_pallas.cholesky)(K)

    @jax.jit
    def tri_inv_xla(L):
        return jax.scipy.linalg.solve_triangular(
            L, jnp.broadcast_to(eye, L.shape), lower=True)

    t_linv = timeit(jax.jit(lambda L: tri_inv_xla(L).sum()), L)
    Linv = tri_inv_xla(L)

    @jax.jit
    def kinv_gemm(Linv):
        return jnp.matmul(jnp.swapaxes(Linv, -1, -2), Linv,
                          precision="float32")

    t_kinv = timeit(jax.jit(lambda x: kinv_gemm(x).sum()), Linv)
    Kinv = kinv_gemm(Linv)

    @jax.jit
    def m1_gemm(Kinv, Gm):
        return jnp.matmul(Kinv, jnp.swapaxes(Gm, -1, -2),
                          precision="float32")

    t_m1 = timeit(jax.jit(lambda a, b: m1_gemm(a, b).sum()), Kinv, Gm)

    @jax.jit
    def gtg(Gm):
        return K + 0.3 * jnp.matmul(jnp.swapaxes(Gm, -1, -2), Gm)

    t_gtg = timeit(jax.jit(lambda g: gtg(g).sum()), Gm)

    M1 = m1_gemm(Kinv, Gm)
    v = jnp.ones((B, m), jnp.float32)
    y = jnp.zeros((B, m), jnp.float32)
    zb = jnp.zeros((B, n), jnp.float32)
    h = jnp.ones((B, m), jnp.float32)

    @jax.jit
    def iters8(v, y):
        def step(carry, _):
            v, y = carry
            z = zb + jnp.einsum("bnm,bm->bn", M1, v - y,
                                precision="float32")
            gz = jnp.einsum("bmn,bn->bm", Gm, z, precision="float32")
            gzr = 1.6 * gz + (1.0 - 1.6) * v
            v_new = jnp.minimum(gzr + y, h)
            y = y + gzr - v_new
            return (v_new, y), None

        (v, y), _ = jax.lax.scan(step, (v, y), None, length=8)
        return v.sum()

    t_it = timeit(iters8, v, y)

    # ---- condensation internals ----
    Ad = jax.random.normal(key, (B, nx, nx), jnp.float32) * 0.01 + jnp.eye(nx)
    Bd_t = jax.random.normal(key, (B, N, nx, nu), jnp.float32)

    @jax.jit
    def pred(Ad, Bd_t):
        Ab, Bb = jax.vmap(lambda a, b: cnd.prediction_matrices(a, b, N))(
            Ad, Bd_t)
        return Ab.sum() + Bb.sum()

    t_pred = timeit(pred, Ad, Bd_t)

    Ab, Bb = jax.jit(jax.vmap(
        lambda a, b: cnd.prediction_matrices(a, b, N)))(Ad, Bd_t)
    Q = jnp.eye(nx, dtype=jnp.float32)
    P = 20.0 * Q
    R = 0.1 * jnp.eye(nu, dtype=jnp.float32)
    Qs = jnp.concatenate([jnp.broadcast_to(Q, (N, nx, nx)), P[None]], 0)
    R_bar = jnp.kron(jnp.eye(N, dtype=jnp.float32), R)
    nz = N * nu

    @jax.jit
    def hform(Bb):
        Bm = Bb.transpose(0, 1, 3, 2, 4).reshape(B, (N + 1) * nx, nz)
        Br = Bm.reshape(B, N + 1, nx, nz)
        QB = jnp.einsum("ixy,biyz->bixz", Qs, Br).reshape(
            B, (N + 1) * nx, nz)
        H = 2.0 * (jnp.einsum("bxi,bxj->bij", Bm, QB) + R_bar)
        return H.sum()

    t_h = timeit(hform, Bb)

    print(f"B={B} device={dev}")
    print(f"chol (pallas)    : {t_chol*1e3:7.2f} ms")
    print(f"Linv (XLA trisolve): {t_linv*1e3:7.2f} ms")
    print(f"Kinv GEMM        : {t_kinv*1e3:7.2f} ms")
    print(f"M1 GEMM          : {t_m1*1e3:7.2f} ms")
    print(f"K + rho G'G      : {t_gtg*1e3:7.2f} ms")
    print(f"8 ADMM iters     : {t_it*1e3:7.2f} ms")
    print(f"pred matrices    : {t_pred*1e3:7.2f} ms")
    print(f"H formation      : {t_h*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
