import time
import jax, jax.numpy as jnp, numpy as np
from mpc_limx_control_tpu.ops import qp as jqp

print("device:", jax.devices())
rng = np.random.default_rng(0)
n, m = 120, 240
def make(B):
    A = rng.normal(size=(B, n, n)).astype(np.float32)
    H = np.einsum("bij,bkj->bik", A, A) / n + 3*np.eye(n, dtype=np.float32)
    f = rng.normal(size=(B, n)).astype(np.float32)
    G = rng.normal(size=(B, m, n)).astype(np.float32)
    h = np.abs(rng.normal(size=(B, m))).astype(np.float32) + 1.0
    return jnp.asarray(H), jnp.asarray(f), jnp.asarray(G), jnp.asarray(h)

for B in (1024, 4096):
    Hb, fb, Gb, hb = make(B)
    for iters in (10, 20):
        solve = jax.jit(jax.vmap(lambda H,f,G,h: jqp.pdip_qp(H,f,G,h,iters=iters).u))
        u = solve(Hb, fb, Gb, hb); _ = np.asarray(u)  # warm
        ts=[]
        for _ in range(5):
            t0=time.perf_counter()
            u = solve(Hb, fb, Gb, hb)
            un = np.asarray(u)   # force full fetch
            ts.append(time.perf_counter()-t0)
        flops = B*iters*(2*n*m*n + n**3/3 + 6*n*n) 
        t = float(np.median(ts))
        print(f"B={B} iters={iters}: {t*1e3:.2f} ms  -> {B*iters and B/t:,.0f} solves/s  est {flops/t/1e12:.1f} TFLOP/s  checksum {un.sum():.3f}")
