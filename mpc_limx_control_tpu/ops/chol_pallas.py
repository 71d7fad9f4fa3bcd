"""Pallas TPU kernels: batched Cholesky factorization + SPD solve.

XLA's `jnp.linalg.cholesky`/`triangular_solve` on TPU are slow for large
batches of small SPD matrices (the hot op of the batched PDIP solver, see
ops/qp.py): the factorization is a chain of small ops with poor MXU/VPU
mapping.  This kernel uses the one layout the VPU loves: **batch-last**
[n, n, B_tile] with the batch in the 128-wide lane dimension, so every
step of the factorization — pivot extract, column scale, rank-1 trailing
update — is a fully dense masked elementwise op across 128 scenarios at
once, with zero transposes, gathers, or matmuls.  The only sequential
dependency is the n column steps of the algorithm itself.

API (batch-first at the boundary for drop-in use):
  * cholesky(M):           [B, n, n] SPD -> lower L [B, n, n]
  * posdef_solve(M, rhs):  [B, n, n], [B, n, k] -> M^{-1} rhs, one fused
                           kernel (factor + forward/back substitution).

B must be a multiple of the lane tile (128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _chol_body(A, n: int):
    """In-VMEM Cholesky of A [n, n, L] (per-lane matrices), lower.

    No dynamic indexing (unsupported on values in Mosaic): every extract
    and write is a masked reduction / select against full-shape iota grids
    (full shapes avoid Mosaic relayout bugs with replicated singleton
    dims).
    """
    L = A.shape[-1]
    row3 = lax.broadcasted_iota(jnp.int32, (n, n, L), 0)
    col3 = lax.broadcasted_iota(jnp.int32, (n, n, L), 1)
    row2 = lax.broadcasted_iota(jnp.int32, (n, L), 0)

    def step(j, A):
        colj_full = jnp.sum(jnp.where(col3 == j, A, 0.0), axis=1)  # [n, L]
        d = jnp.maximum(
            jnp.sum(jnp.where(row2 == j, colj_full, 0.0), axis=0),
            1e-30)                                                 # [L]
        inv_sqrt = lax.rsqrt(d)
        colj = jnp.where(row2 > j, colj_full * inv_sqrt[None, :],
                         0.0)                                      # [n, L]
        newcol = jnp.where(row2 == j,
                           jnp.broadcast_to(jnp.sqrt(d)[None, :], (n, L)),
                           colj)
        A = jnp.where(col3 == j,
                      jnp.broadcast_to(newcol[:, None, :], (n, n, L)), A)
        outer = colj[:, None, :] * colj[None, :, :]                # [n,n,L]
        trail = (row3 > j) & (col3 > j)
        return A - jnp.where(trail, outer, 0.0)

    A = lax.fori_loop(0, n, step, A)
    return jnp.where(col3 <= row3, A, 0.0)


def _fwd_sub(L_, B_, n: int):
    """Solve L Y = B; L_ [n, n, L] lower, B_ [n, k, L]."""
    L = L_.shape[-1]
    k = B_.shape[1]
    row3 = lax.broadcasted_iota(jnp.int32, (n, n, L), 0)
    col3 = lax.broadcasted_iota(jnp.int32, (n, n, L), 1)
    rowk = lax.broadcasted_iota(jnp.int32, (n, k, L), 0)
    row2 = lax.broadcasted_iota(jnp.int32, (n, L), 0)
    diag = jnp.sum(jnp.where(row3 == col3, L_, 0.0), axis=1)       # [n, L]

    def step(i, Y):
        Li = jnp.sum(jnp.where(row3 == i, L_, 0.0), axis=0)        # [n, L]
        prior = jnp.where(rowk < i,
                          jnp.broadcast_to(Li[:, None, :], (n, k, L)), 0.0)
        partial = jnp.sum(prior * Y, axis=0)                       # [k, L]
        bi = jnp.sum(jnp.where(rowk == i, B_, 0.0), axis=0)        # [k, L]
        di = jnp.maximum(
            jnp.sum(jnp.where(row2 == i, diag, 0.0), axis=0), 1e-30)
        yi = (bi - partial) / di[None, :]
        return jnp.where(rowk == i,
                         jnp.broadcast_to(yi[None, :, :], (n, k, L)), Y)

    return lax.fori_loop(0, n, step, B_)


def _bwd_sub(L_, Y, n: int):
    """Solve L^T X = Y in the same layout."""
    L = L_.shape[-1]
    k = Y.shape[1]
    row3 = lax.broadcasted_iota(jnp.int32, (n, n, L), 0)
    col3 = lax.broadcasted_iota(jnp.int32, (n, n, L), 1)
    rowk = lax.broadcasted_iota(jnp.int32, (n, k, L), 0)
    row2 = lax.broadcasted_iota(jnp.int32, (n, L), 0)
    diag = jnp.sum(jnp.where(row3 == col3, L_, 0.0), axis=1)       # [n, L]

    def step(t, X):
        i = n - 1 - t
        Lci = jnp.sum(jnp.where(col3 == i, L_, 0.0), axis=1)       # [n, L]
        post = jnp.where(rowk > i,
                         jnp.broadcast_to(Lci[:, None, :], (n, k, L)), 0.0)
        partial = jnp.sum(post * X, axis=0)                        # [k, L]
        xi_num = jnp.sum(jnp.where(rowk == i, X, 0.0), axis=0) - partial
        di = jnp.maximum(
            jnp.sum(jnp.where(row2 == i, diag, 0.0), axis=0), 1e-30)
        xi = xi_num / di[None, :]
        return jnp.where(rowk == i,
                         jnp.broadcast_to(xi[None, :, :], (n, k, L)), X)

    return lax.fori_loop(0, n, step, Y)


def _posdef_solve_kernel(n: int, m_ref, b_ref, x_ref):
    L_ = _chol_body(m_ref[:], n)
    Y = _fwd_sub(L_, b_ref[:], n)
    x_ref[:] = _bwd_sub(L_, Y, n)


def _chol_kernel(n: int, m_ref, l_ref):
    l_ref[:] = _chol_body(m_ref[:], n)


def _to_batch_last(M):
    return jnp.transpose(M, (1, 2, 0))


def _to_batch_first(M):
    return jnp.transpose(M, (2, 0, 1))


@functools.partial(jax.jit, static_argnames=())
def cholesky(M: jnp.ndarray) -> jnp.ndarray:
    """Batched lower Cholesky: M [B, n, n] SPD -> L [B, n, n]."""
    B, n, _ = M.shape
    assert B % LANES == 0, B
    Mt = _to_batch_last(M)                              # [n, n, B]
    kernel = functools.partial(_chol_kernel, n)
    Lt = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, n, B), M.dtype),
    )(Mt)
    return _to_batch_first(Lt)


def _chol_solve_kernel(n: int, l_ref, b_ref, x_ref):
    L_ = l_ref[:]
    Y = _fwd_sub(L_, b_ref[:], n)
    x_ref[:] = _bwd_sub(L_, Y, n)


@functools.partial(jax.jit, static_argnames=())
def chol_solve(L: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Batched triangular solves with a precomputed factor:
    L [B,n,n] lower, rhs [B,n,k] -> (L L^T)^{-1} rhs."""
    B, n, _ = L.shape
    k = rhs.shape[-1]
    assert B % LANES == 0, B
    Lt = _to_batch_last(L)
    Bt = _to_batch_last(rhs)
    kernel = functools.partial(_chol_solve_kernel, n)
    Xt = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, B), rhs.dtype),
    )(Lt, Bt)
    return _to_batch_first(Xt)


def _posdef_fast_kernel(n: int, k: int, m_ref, b_ref, x_ref, A, Y, diag):
    """Column-oriented in-place factor + solves using scratch REFS.

    Layout: A [n(col), n(row), L] — A[j] is column j as a [n, L] tile, so
    every access the algorithm needs (pivot, column scale, both
    substitutions) is a cheap dynamic-leading-index ref read; the only
    full-matrix traffic is the one rank-1 trailing update per column.
    """
    L = A.shape[-1]
    r2 = lax.broadcasted_iota(jnp.int32, (n, L), 0)
    rc_mask_row = lax.broadcasted_iota(jnp.int32, (n, n, L), 0)
    rc_mask_col = lax.broadcasted_iota(jnp.int32, (n, n, L), 1)
    rk = lax.broadcasted_iota(jnp.int32, (n, k, L), 0)

    # M is symmetric: its rows equal its columns, so the input block can be
    # copied straight into the column-major scratch.
    A[:] = m_ref[:]
    Y[:] = b_ref[:]

    def chol_step(j, _):
        col = A[j]                                      # [n, L]
        d = jnp.maximum(
            jnp.sum(jnp.where(r2 == j, col, 0.0), axis=0), 1e-30)
        inv = lax.rsqrt(d)
        colj = jnp.where(r2 > j, col * inv[None, :], 0.0)
        sq = jnp.sqrt(d)
        A[j] = colj + jnp.where(r2 == j, sq[None, :], 0.0)
        diag[j] = sq[None, :]
        trail = (rc_mask_row > j) & (rc_mask_col > j)
        # one full-matrix rank-1 update (column-major: [c, r, L])
        A[:] = A[:] - jnp.where(trail,
                                colj[:, None, :] * colj[None, :, :], 0.0)
        return 0

    lax.fori_loop(0, n, chol_step, 0)

    def fwd_step(j, _):
        dj = jnp.maximum(jnp.sum(jnp.where(r2 == j, diag[:, 0, :], 0.0),
                                 axis=0), 1e-30)        # [L]
        yj = jnp.sum(jnp.where(rk == j, Y[:], 0.0), axis=0) / dj[None, :]
        colj = jnp.where(r2 > j, A[j], 0.0)             # [n, L]
        Y[:] = (jnp.where(rk == j, yj[None, :, :], Y[:])
                - jnp.where(rk > j, colj[:, None, :] * yj[None, :, :],
                            0.0))
        return 0

    lax.fori_loop(0, n, fwd_step, 0)

    def bwd_step(t, _):
        j = n - 1 - t
        dj = jnp.maximum(jnp.sum(jnp.where(r2 == j, diag[:, 0, :], 0.0),
                                 axis=0), 1e-30)
        colj = jnp.where(r2 > j, A[j], 0.0)             # rows > j
        partial = jnp.sum(colj[:, None, :] * Y[:], axis=0)   # [k, L]
        yj = jnp.sum(jnp.where(rk == j, Y[:], 0.0), axis=0)
        xj = (yj - partial) / dj[None, :]
        Y[:] = jnp.where(rk == j, xj[None, :, :], Y[:])
        return 0

    lax.fori_loop(0, n, bwd_step, 0)
    x_ref[:] = Y[:]


@functools.partial(jax.jit, static_argnames=())
def posdef_solve_fast(M: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Column-oriented fused SPD solve: M [B,n,n] (symmetric), rhs
    [B,n,k] -> M^{-1} rhs.  Faster than posdef_solve: the factorization
    does one full-matrix pass per column instead of ~4 masked
    extractions, and both substitutions touch only [n,L]/[n,k,L] tiles."""
    B, n, _ = M.shape
    k = rhs.shape[-1]
    assert B % LANES == 0, B
    Mt = _to_batch_last(M)
    Bt = _to_batch_last(rhs)
    kernel = functools.partial(_posdef_fast_kernel, n, k)
    Xt = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, B), rhs.dtype),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), M.dtype),     # A (column-major)
            pltpu.VMEM((n, k, LANES), rhs.dtype),   # Y
            pltpu.VMEM((n, 1, LANES), M.dtype),     # diag
        ],
    )(Mt, Bt)
    return _to_batch_first(Xt)


@functools.partial(jax.jit, static_argnames=())
def posdef_solve(M: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    """Fused batched SPD solve: M [B,n,n], rhs [B,n,k] -> M^{-1} rhs."""
    B, n, _ = M.shape
    k = rhs.shape[-1]
    assert B % LANES == 0, B
    Mt = _to_batch_last(M)
    Bt = _to_batch_last(rhs)                            # [n, k, B]
    kernel = functools.partial(_posdef_solve_kernel, n)
    Xt = pl.pallas_call(
        kernel,
        grid=(B // LANES,),
        in_specs=[
            pl.BlockSpec((n, n, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n, k, LANES), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, k, B), rhs.dtype),
    )(Mt, Bt)
    return _to_batch_first(Xt)
