import time
import jax, jax.numpy as jnp, numpy as np

B, n, m = 1024, 120, 240
rng = np.random.default_rng(0)
A = rng.normal(size=(B,n,n)).astype(np.float32)
H = jnp.asarray(np.einsum("bij,bkj->bik",A,A)/n + 3*np.eye(n,dtype=np.float32))
G = jnp.asarray(rng.normal(size=(B,m,n)).astype(np.float32))
d = jnp.asarray(np.abs(rng.normal(size=(B,m))).astype(np.float32))
rhs = jnp.asarray(rng.normal(size=(B,n)).astype(np.float32))

def timeit(name, fn, *args):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    ts=[]
    for _ in range(5):
        t0=time.perf_counter(); out = fn(*args); np.asarray(jax.tree.leaves(out)[0]); ts.append(time.perf_counter()-t0)
    print(f"{name}: {np.median(ts)*1e3:.2f} ms")

timeit("GtDG gemm", jax.jit(lambda G,d: jnp.einsum("bmn,bm,bmk->bnk", G, d, G)), G, d)
M = jnp.einsum("bmn,bm,bmk->bnk", G, d, G) + H
timeit("cholesky", jax.jit(jnp.linalg.cholesky), M)
L = jnp.linalg.cholesky(M)
timeit("tri_solve", jax.jit(lambda L, r: jax.scipy.linalg.solve_triangular(L, r[...,None], lower=True)), L, rhs)
timeit("full inv", jax.jit(jnp.linalg.inv), M)
timeit("lin solve", jax.jit(lambda M, r: jnp.linalg.solve(M, r[...,None])), M, rhs)
# matvec chain like ADMM iteration
K = M
timeit("admm-iter (2 gemv + clip)", jax.jit(lambda G, z, y: jnp.clip(jnp.einsum("bmn,bn->bm",G,z)+y, -1., 1.)), G, rhs, d)
