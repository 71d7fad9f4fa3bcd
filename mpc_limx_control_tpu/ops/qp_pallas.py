"""Fully-fused batched PDIP solver as a single Pallas TPU kernel.

ops/qp.py's batched PDIP already uses the Pallas Cholesky kernel
(ops/chol_pallas.py), but every iteration crosses the kernel boundary:
each call transposes [B,n,n] <-> [n,n,B] (tens of MB of HBM traffic per
Newton step) and the GEMMs/vector algebra in between materialize to HBM.
This kernel keeps the ENTIRE solve resident in VMEM in the batch-last
layout — H, G, h, f load once per 128-scenario tile; all `iters` Newton
steps (residuals, G'DG formation, Cholesky, substitutions, fraction-to-
boundary, best-iterate tracking) run on the VPU with the batch in the
lane dimension; only z_best/lambda/merit are written back.

VMEM per tile (n=60, m=120, f32): H 1.8 MB + G 3.7 MB + M/L 3.6 MB +
vectors < 1 MB ~= 9.5 MB — fits the 16 MB budget for the walking QP.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_limx_control_tpu.ops.chol_pallas import (LANES, _bwd_sub,
                                                  _chol_body, _fwd_sub)


def _mv_rows(A, x):
    """A [r,c,L], x [c,L] -> [r,L]: per-lane matvec (sum over columns)."""
    return jnp.sum(A * x[None, :, :], axis=1)


def _mv_cols(A, x):
    """A [r,c,L], x [r,L] -> [c,L]: per-lane A^T x (sum over rows)."""
    return jnp.sum(A * x[:, None, :], axis=0)


def _form_m(H, G, d, n, m, chunk=8):
    """M = H + G^T diag(d) G in batch-last layout, accumulated in static
    m-chunks to bound the [chunk, n, n, L] intermediate (dynamic slicing
    of values is unsupported in Mosaic, so the chunk loop is unrolled)."""
    Gd = G * d[:, None, :]                              # [m, n, L]
    M = H
    for lo in range(0, m, chunk):
        a = Gd[lo:lo + chunk]
        b = G[lo:lo + chunk]
        M = M + jnp.sum(a[:, :, None, :] * b[:, None, :, :], axis=0)
    return M


def _pdip_kernel(n: int, m: int, iters: int, eps: float, d_cap: float,
                 reg: float,
                 h_ref, f_ref, g_ref, hb_ref, z0_ref, s0_ref, lam0_ref,
                 zb_ref, merit_ref, zf_ref, lamf_ref):
    # H and G live in HBM (memory_space ANY) and are DMA'd once per tile
    # into scoped VMEM — double-buffered BlockSpec streaming of the two
    # large operands would blow the 16 MB VMEM budget.
    i = pl.program_id(0)

    def body(H_s, G_s, sems):
        cp_h = pltpu.make_async_copy(
            h_ref.at[:, :, pl.ds(i * LANES, LANES)], H_s, sems.at[0])
        cp_g = pltpu.make_async_copy(
            g_ref.at[:, :, pl.ds(i * LANES, LANES)], G_s, sems.at[1])
        cp_h.start()
        cp_g.start()
        cp_h.wait()
        cp_g.wait()
        _pdip_body(n, m, iters, eps, d_cap, reg, H_s[:], G_s[:],
                   f_ref, hb_ref, z0_ref, s0_ref, lam0_ref,
                   zb_ref, merit_ref, zf_ref, lamf_ref)

    pl.run_scoped(
        body,
        H_s=pltpu.VMEM((n, n, LANES), h_ref.dtype),
        G_s=pltpu.VMEM((m, n, LANES), g_ref.dtype),
        sems=pltpu.SemaphoreType.DMA((2,)),
    )


def _pdip_body(n, m, iters, eps, d_cap, reg, H, G,
               f_ref, hb_ref, z0_ref, s0_ref, lam0_ref,
               zb_ref, merit_ref, zf_ref, lamf_ref):
    f = f_ref[:][:, 0, :]                               # [n, L]
    hb = hb_ref[:][:, 0, :]                             # [m, L]
    eye_reg = (lax.broadcasted_iota(jnp.int32, (n, n, 1), 0)
               == lax.broadcasted_iota(jnp.int32, (n, n, 1), 1)
               ).astype(H.dtype) * reg

    z = z0_ref[:][:, 0, :]
    s = s0_ref[:][:, 0, :]
    lam = lam0_ref[:][:, 0, :]

    f_scale = 1.0 + jnp.max(jnp.abs(f), axis=0)         # [L]
    mu0 = jnp.sum(s * lam, axis=0) / m

    def merit_of(z, s, lam):
        r_dual = _mv_rows(H, z) + f + _mv_cols(G, lam)
        r_prim = jnp.maximum(_mv_rows(G, z) - hb, 0.0)
        mu = jnp.sum(s * lam, axis=0) / m
        return (jnp.max(jnp.abs(r_dual), axis=0) / f_scale
                + jnp.max(r_prim, axis=0) + mu / mu0)

    def max_step(v, dv):
        ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
        return jnp.minimum(1.0, jnp.min(ratio, axis=0))

    def newton(_, carry):
        z, s, lam, z_best, merit_best = carry
        r_dual = _mv_rows(H, z) + f + _mv_cols(G, lam)
        gz = _mv_rows(G, z)
        r_prim = gz + s - hb
        mu = jnp.sum(s * lam, axis=0) / m

        s_safe = jnp.maximum(s, eps)
        d = jnp.minimum(lam / s_safe, d_cap)
        M = _form_m(H, G, d, n, m) + eye_reg
        Lc = _chol_body(M, n)

        def direction(r_comp):
            rhs = -r_dual + _mv_cols(G, (r_comp - lam * r_prim) / s_safe)
            dz = _bwd_sub(Lc, _fwd_sub(Lc, rhs[:, None, :], n), n)[:, 0, :]
            ds = -r_prim - _mv_rows(G, dz)
            dlam = -(r_comp + lam * ds) / s_safe
            return dz, ds, dlam

        dz_a, ds_a, dlam_a = direction(s * lam)
        a_aff = jnp.minimum(max_step(s, ds_a), max_step(lam, dlam_a))
        mu_aff = jnp.sum((s + a_aff[None, :] * ds_a)
                         * (lam + a_aff[None, :] * dlam_a), axis=0) / m
        sigma = (mu_aff / jnp.maximum(mu, eps)) ** 3

        dz, ds, dlam = direction(
            s * lam - (sigma * mu)[None, :] + ds_a * dlam_a)
        alpha = (0.99 * jnp.minimum(max_step(s, ds),
                                    max_step(lam, dlam)))[None, :]
        z = z + alpha * dz
        s = jnp.maximum(s + alpha * ds, eps)
        lam = jnp.maximum(lam + alpha * dlam, eps)

        merit = merit_of(z, s, lam)
        better = merit < merit_best
        z_best = jnp.where(better[None, :], z, z_best)
        merit_best = jnp.where(better, merit, merit_best)
        return (z, s, lam, z_best, merit_best)

    init = (z, s, lam, z, merit_of(z, s, lam))
    z_f, s_f, lam_f, z_best, merit_best = lax.fori_loop(
        0, iters, newton, init)

    zb_ref[:] = z_best[:, None, :]
    merit_ref[:] = merit_best[None, :]
    zf_ref[:] = z_f[:, None, :]
    lamf_ref[:] = lam_f[:, None, :]


@functools.partial(jax.jit, static_argnames=("iters",))
def pdip_fused(H, f, G, h, z0, s0, lam0, iters: int = 6):
    """Batch-first API: H [B,n,n], f [B,n], G [B,m,n], h/s0/lam0 [B,m],
    z0 [B,n].  Returns (z_best [B,n], merit [B], z_final, lam_final).

    B must be a multiple of 128 (callers pad, see ops/qp.py).
    """
    B, n_orig = f.shape
    m = h.shape[-1]
    dtype = H.dtype
    assert B % LANES == 0, B
    assert m % 8 == 0, m
    eps, d_cap, reg = 1e-8, 1e7, 1e-6

    # pad n to the 8-sublane tiling (required for the HBM->VMEM tile DMA);
    # padded diagonal is identity, padded f/G/z0 are zero, so the padded
    # coordinates stay exactly zero through the solve
    n = ((n_orig + 7) // 8) * 8
    if n != n_orig:
        dn = n - n_orig
        pad_eye = jnp.zeros((B, n, n), dtype)
        pad_eye = pad_eye.at[:, :n_orig, :n_orig].set(H)
        pad_eye = pad_eye.at[:, n_orig:, n_orig:].add(
            jnp.eye(dn, dtype=dtype))
        H = pad_eye
        f = jnp.pad(f, ((0, 0), (0, dn)))
        G = jnp.pad(G, ((0, 0), (0, 0), (0, dn)))
        z0 = jnp.pad(z0, ((0, 0), (0, dn)))

    tl = lambda x: jnp.transpose(x, (1, 2, 0))          # [B,r,c]->[r,c,B]
    Ht = tl(H)
    Gt = tl(G)
    fv = f.T[:, None, :]                                # [n,1,B]
    hv = h.T[:, None, :]
    z0v = z0.T[:, None, :]
    s0v = s0.T[:, None, :]
    lam0v = lam0.T[:, None, :]

    kernel = functools.partial(_pdip_kernel, n, m, iters, eps, d_cap, reg)
    grid = (B // LANES,)

    def spec(r, c):
        return pl.BlockSpec((r, c, LANES), lambda i: (0, 0, i),
                            memory_space=pltpu.VMEM)

    any_spec = pl.BlockSpec(memory_space=pl.ANY)
    zb, merit, zf, lamf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[any_spec, spec(n, 1), any_spec, spec(m, 1),
                  spec(n, 1), spec(m, 1), spec(m, 1)],
        out_specs=(spec(n, 1),
                   pl.BlockSpec((1, LANES), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   spec(n, 1), spec(m, 1)),
        out_shape=(jax.ShapeDtypeStruct((n, 1, B), dtype),
                   jax.ShapeDtypeStruct((1, B), dtype),
                   jax.ShapeDtypeStruct((n, 1, B), dtype),
                   jax.ShapeDtypeStruct((m, 1, B), dtype)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(Ht, fv, Gt, hv, z0v, s0v, lam0v)

    return (zb[:n_orig, 0, :].T, merit[0, :], zf[:n_orig, 0, :].T,
            lamf[:, 0, :].T)
