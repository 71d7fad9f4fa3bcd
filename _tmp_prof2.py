import time
import jax, jax.numpy as jnp, numpy as np
import jax.scipy.linalg as jsl

B, n, m = 1024, 60, 120
rng = np.random.default_rng(0)
A = rng.normal(size=(B,n,n)).astype(np.float32)
H = jnp.asarray(np.einsum("bij,bkj->bik",A,A)/n + 3*np.eye(n,dtype=np.float32))
G = jnp.asarray(rng.normal(size=(B,m,n)).astype(np.float32))
d = jnp.asarray(np.abs(rng.normal(size=(B,m))).astype(np.float32))
rhs = jnp.asarray(rng.normal(size=(B,n,2)).astype(np.float32))

def timeit(name, fn, *args, reps=5):
    out = fn(*args); np.asarray(jax.tree.leaves(out)[0])
    ts=[]
    for _ in range(reps):
        t0=time.perf_counter(); out = fn(*args); np.asarray(jax.tree.leaves(out)[0]); ts.append(time.perf_counter()-t0)
    print(f"{name}: {np.median(ts)*1e3:.2f} ms")

timeit("GtDG einsum", jax.jit(lambda G,d: jnp.einsum("bmn,bm,bmk->bnk", G, d, G)), G, d)
timeit("GtDG matmul", jax.jit(lambda G,d: jnp.matmul(jnp.swapaxes(G,-1,-2), G*d[...,None])), G, d)
M = jnp.matmul(jnp.swapaxes(G,-1,-2), G*d[...,None]) + H
timeit("cholesky n=60", jax.jit(jnp.linalg.cholesky), M)
timeit("linalg.solve 2rhs", jax.jit(lambda M,r: jnp.linalg.solve(M,r)), M, rhs)
timeit("lu_factor", jax.jit(lambda M: jsl.lu_factor(M)), M)
lu = jsl.lu_factor(M)
timeit("lu_solve 2rhs", jax.jit(lambda lu,r: jsl.lu_solve(lu, r)), lu, rhs)
# 20-iteration PDIP-shaped loop with LU
def fake_pdip(H, G, d0, r):
    def body(c, _):
        dd, rr = c
        M = H + jnp.matmul(jnp.swapaxes(G,-1,-2), G*dd[...,None])
        lu = jsl.lu_factor(M)
        s = jsl.lu_solve(lu, rr)
        dd2 = dd * 0.99 + 0.01*jnp.abs(s[...,0]).mean(-1,keepdims=True)
        return (dd2, rr + 0.001*s), None
    (ddf, rrf), _ = jax.lax.scan(body, (d0, r), None, length=20)
    return rrf
timeit("20x LU-pdip-shape", jax.jit(fake_pdip), H, G, d, rhs, reps=3)
