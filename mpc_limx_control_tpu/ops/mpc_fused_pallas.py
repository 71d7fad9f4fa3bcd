"""Fused per-scenario MPC Pallas kernel: condensation + warm ADMM in VMEM.

The walking GRF MPC pipeline (reference src/QPSolver.cpp:31-106 — the
O(N^2) dense condensation + QP solve) spends ~77% of the batched tick in
small-matrix ops (60x60-class) that XLA executes 10-50x off roofline:
every intermediate (prediction matrices, QB, H, K, L, L^-1, K^-1, M1)
round-trips HBM, and the batched Cholesky/triangular ops fragment into
chains of tiny kernels.

This kernel fuses the ENTIRE per-scenario solve into one Pallas program in
batch-last layout [..., 128 lanes], with zero HBM intermediates:

  1. band-form condensation (LTI Ad + LTV Bd + diagonal weights):
         W_k = Q + Ad' W_{k+1} Ad          (backward Gramian recursion)
         K[j,k]/2 = Bd_j' (Ad')^{k-j} W_k Bd_k   (+ R, cone, reg on diag)
         f_j/2 = Bd_j' s_j,  s_j = q_{j+1} err_{j+1} + Ad' s_{j+1}
     identical math to ops/condense.py:condense_lti_diag, which equals the
     reference cost layout (src/QPSolver.cpp:50-60) exactly;
  2. in-place column-major Cholesky of K = H + rho G'G + reg I
     (the ops/chol_pallas.py fast-kernel pattern);
  3. `iters` over-relaxed ADMM iterations in factor form — each iteration
     is one forward/backward substitution pair plus the friction-cone
     projection (identical iterates to ops/qp.py:_batched_admm, but exact
     triangular solves instead of the explicit f32 K^-1);
  4. splitting residual, all in VMEM.

Only dynamic-LEADING-index ref accesses are used (Mosaic-safe; the
non-leading mirror writes of the symmetric K are handled by a static
60-step symmetrization pass), no in-kernel reshapes or transposes, and the
only MXU ops contract against compile-time-constant cone matrices.

Per 128-lane block the whole solve is ~100k VPU cycles; at B=4096 the
fused path replaces ~31 ms of XLA ops with ~3-4 ms.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mpc_limx_control_tpu.core.types import QPSolution

LANES = 128


def _mm_lane(A, Bv, nx: int):
    """Per-lane contraction C[y,u,l] = sum_x A[x,y,l] * Bv[x,u,l].

    A [nx, p, L], Bv [nx, q, L] -> [p, q, L]; static nx-step accumulation
    (outer products over lanes — pure VPU, no relayout)."""
    acc = A[0][:, None, :] * Bv[0][None, :, :]
    for x in range(1, nx):
        acc = acc + A[x][:, None, :] * Bv[x][None, :, :]
    return acc


def _mpc_core(N, nx, nu, mu_, iters, rho, alpha,
              ad, bd_ref, ref_row, x0,
              zw_ref, yw_ref, qv_ref, pv_ref, dblk_ref,
              gmat_ref, gmt_ref, h_ref,
              z_out, y_out, res_out,
              S, w_ref, qe_ref, f_ref, dg_ref, Yv,
              xp_out=None, sp=None, prof_skip=(), solve_form="subst"):
    """Shared kernel core: band condensation -> Cholesky -> warm ADMM.

    ad: [nx, nx, L] VALUE (row-major: ad[x] is row x of Ad).
    bd_ref: any ref laid out [N*nx, nu, L] (input ref or scratch).
    ref_row(j): callback returning the reference state row j as
    [nx, L] (reads an input ref, or synthesizes it in the prep variant).

    sp: optional dict of structure-exploiting closures supplied by the
    prep path (the SRBD Ad is I + a nilpotent coupling with ~12 nonzero
    entries, and Bd has two dense 3x3 blocks + two scaled-identity
    blocks — the dense 13x13/13x3 chains are ~14x/1.6x more multiplies
    than the closed forms).  Keys: 'adT' (M -> Ad' M on the leading
    index), 'ad_right' (M [.,nx,L] -> M Ad), 'ad' (x [nx,L] -> Ad x),
    'bdc' (V [nx,b,L], j -> [b,nu,L] = V' Bd_j contraction).  None =
    generic dense math (arbitrary Ad/Bd inputs).

    prof_skip: trace-time stage-skip set for marginal-cost profiling
    ONLY (tools/prof_tick_stages.py) — skipping a stage leaves its
    scratch garbage, so outputs are meaningless; timing stays valid.
    Stages: "gram", "cols", "lint", "chol", "admm", "solve".
    """
    n = N * nu
    m = N * mu_
    L = LANES
    f32 = jnp.float32

    q_v = qv_ref[:]                                       # [nx, 1]
    p_v = pv_ref[:]                                       # [nx, 1]
    # diagonal-block constant: 2R + rho Gu'Gu + reg I  (the j == k add-on)
    diag_blk = dblk_ref[:]                                # [nu, nu]
    # expanded cone matrices for MXU matvecs (batch-invariant constants)
    Gmat_c = gmat_ref[:]                                  # [m, n]
    GmatT_c = gmt_ref[:]                                  # [n, m]
    h_c = h_ref[:]                                        # [m, 1]

    # ---- 1a. backward Gramian recursion W_k -> w_ref ----------------
    # STATIC backward loop: the diagonal weight masks are hoisted and
    # built once, every w_ref write has a compile-time offset, and the
    # k == N-1 select disappears (it is just the first static step).
    eye_nx = (lax.broadcasted_iota(jnp.int32, (nx, nx, L), 0)
              == lax.broadcasted_iota(jnp.int32, (nx, nx, L), 1))
    diag_q = jnp.where(eye_nx, q_v[:, :, None]
                       * jnp.ones((nx, nx, L), f32), 0.0)
    diag_p = jnp.where(eye_nx, p_v[:, :, None]
                       * jnp.ones((nx, nx, L), f32), 0.0)

    if "gram" not in prof_skip:
        W = diag_p                           # W_{N-1} = diag(p)
        w_ref[nx * (N - 1):nx * N] = W
        for k in range(N - 2, -1, -1):
            if sp is not None:
                Wn = sp["ad_right"](sp["adT"](W))
            else:
                # Z[y,c,l] = sum_x Ad[x,y,l] W[x,c,l]   (Ad' W)
                Z = _mm_lane(ad, W, nx)
                # Wn[y,c',l] = sum_c Z[y,c,l] Ad[c,c',l]
                Wn = Z[:, 0, :][:, None, :] * ad[0][None, :, :]
                for c in range(1, nx):
                    Wn = Wn + Z[:, c, :][:, None, :] * ad[c][None, :, :]
            W = Wn + diag_q                  # diag(q) + Ad' W Ad
            w_ref[nx * k:nx * (k + 1)] = W

    # ---- 1b. band emission: columns k (dynamic), rows j (static) ----
    # S (column-major scratch) gets S[nu*k+b, nu*j+a] = K[nu*j+a, nu*k+b]
    # for j <= k — the upper triangle of K, written with the dynamic
    # index leading.
    # STATIC double loop: only the j <= k upper triangle is computed
    # (half the bdc/adT work the fori version spent masking away), and
    # every w_ref read / S write uses compile-time offsets.
    if "cols" not in prof_skip:
        for k in range(N):
            Wk = w_ref[nx * k:nx * (k + 1)]               # [nx, nx, L]
            if sp is not None:
                # sum_x Wk[x,y] Bk[x,u] = (W_k' B_k)[y,u] = W_k B_k
                t = sp["bdc"](Wk, k)
            else:
                Bk = bd_ref[nx * k:nx * (k + 1)]          # [nx, nu, L]
                t = _mm_lane(Wk, Bk, nx)
            for j in range(k, -1, -1):
                if sp is not None:
                    E = sp["bdc"](t, j)                   # [nu, nu, L]
                else:
                    Bj = bd_ref[nx * j:nx * (j + 1)]      # [nx, nu, L]
                    # E[b,a,l] = sum_x t[x,b,l] Bj[x,a,l] ( = (Bd_j'T)')
                    E = _mm_lane(t, Bj, nx)
                blk = 2.0 * E
                if j == k:
                    blk = blk + (jnp.swapaxes(diag_blk, 0, 1)[:, :, None]
                                 * jnp.ones((nu, nu, L), f32))
                S[nu * k:nu * (k + 1), nu * j:nu * (j + 1), :] = blk
                if j > 0:
                    # t <- Ad' t for the next (smaller) j
                    t = sp["adT"](t) if sp is not None \
                        else _mm_lane(ad, t, nx)

    # ---- 1c. symmetrize S in place (static slice copies) -------------
    # After emission S[c, r] holds K[r, c] only for r <= c; fill rows
    # r > c of column c from the mirror row c of columns r (no masks:
    # both sides are compile-time slices).
    for c in range(n - 1):
        S[c, c + 1:, :] = S[c + 1:, c, :]

    # ---- 1d. linear term f: forward error sweep + adjoint ------------
    # STATIC sweeps: the terminal-weight select and the dynamic
    # qe/f_ref indexing of the fori version become compile-time.
    if "lint" not in prof_skip:
        x = x0
        for j in range(N):
            # x_{j+1} = Ad x_j
            if sp is not None:
                xn = sp["ad"](x)
            else:
                # ad[x] is ROW x of Ad: contract over the SECOND index.
                xn = ad[:, 0, :] * x[0:1]
                for c in range(1, nx):
                    xn = xn + ad[:, c, :] * x[c:c + 1]
            qw = p_v if j == N - 1 else q_v               # [nx, 1]
            qe_ref[j] = qw * (xn - ref_row(j + 1))
            x = xn

        s = jnp.zeros((nx, L), f32)
        for j in range(N - 1, -1, -1):
            if sp is not None:
                sj = qe_ref[j] + sp["adT"](s)
                fj = sp["bdc"](sj[:, None, :], j)[0]      # [nu, L]
            else:
                sj = qe_ref[j] + _ad_t_vec(ad, s, nx)
                Bj_s = bd_ref[nx * j:nx * (j + 1)]        # [nx, nu, L]
                fj = Bj_s[0, :, :] * sj[0:1]
                for xx in range(1, nx):
                    fj = fj + Bj_s[xx, :, :] * sj[xx:xx + 1]
            f_ref[nu * j:nu * (j + 1)] = 2.0 * fj
            s = sj

    # ---- 2. in-place column-major Cholesky of S ----------------------
    # STATIC pivot loop: every step touches only the trailing
    # (n-j-1)-column / (n-j-1)-row slice with compile-time offsets —
    # n^3/3 true-Cholesky work instead of the n^3 a masked full-matrix
    # rank-1 update pays (plus no per-step iota/select, no masked
    # diagonal extraction).  The factored column j lives in
    # S[j, j+1:, :] (strictly-lower part) + dg_ref[j] (sqrt diagonal);
    # rows <= j of column j are never read again.
    if "chol" not in prof_skip:
        for j in range(n):
            colt = S[j, j:, :]                            # [n-j, L]
            d = jnp.maximum(colt[0:1], 1e-30)             # [1, L]
            inv = lax.rsqrt(d)
            dg_ref[j:j + 1] = jnp.sqrt(d)
            if j + 1 < n:
                colj = colt[1:] * inv                     # [n-j-1, L]
                S[j, j + 1:, :] = colj
                S[j + 1:, j + 1:, :] = (
                    S[j + 1:, j + 1:, :]
                    - colj[:, None, :] * colj[None, :, :])

    # reciprocal diagonal, hoisted out of the 2x(iters+1) triangular
    # sweeps (turns 2n divides+clamps per solve into one multiply each)
    dg_inv = 1.0 / jnp.maximum(dg_ref[:], 1e-30)          # [n, L]

    # ---- 2b. optional explicit factor inverse (solve_form="inv") -----
    # The substitution sweeps below cost ~2n sequential Mosaic ops per
    # sweep, and the warm ADMM runs 2*(iters+1) sweeps per tick — at
    # n = 60 that is ~1.4k short-slice dispatches, the op-overhead-bound
    # region of the roofline (NOTES.md round-5).  Here we instead invert
    # the factor ONCE, IN PLACE (T = L^-1 overwrites S: column i of the
    # storage holds L row i before the write and T row i after — L row i
    # is last read exactly when T row i is produced, and the unused
    # upper region is explicitly zeroed so the running contraction
    # S[:i, :i] * Lrow stays garbage-free), after which every sweep is
    # two full-array multiply+reduce contractions.  ~n x fewer
    # dispatches at ~2x the stage flops; accuracy sits between exact
    # substitution and the XLA path's explicit K^-1 (kappa(L) =
    # sqrt(kappa(K))) — parity pinned by tests/test_mpc_fused.py.
    # n-guard: the trade is ~n x fewer dispatches for ~2x stage flops
    # (plus an n^3/2 one-time inversion) — measured on chip it wins at
    # the walking size (n = 60: +2.7%/+7.2% at B=1024/4096) and LOSES
    # 35% at the standing size (n = 120, flop-dominated), so oversized
    # problems silently keep the substitution sweeps.
    use_inv = solve_form == "inv" and n <= 64
    if use_inv and "chol" not in prof_skip:
        # storage after this loop: S[j, i, :] = T[i, j] for j <= i,
        # 0 for j > i  (second index = row of T = column of storage)
        S[0:1, 0, :] = dg_inv[0:1]
        if n > 1:
            S[1:, 0, :] = jnp.zeros((n - 1, L), f32)
        for i in range(1, n):
            Lrow = S[0:i, i, :]                           # L[i, 0:i]
            contrib = jnp.sum(S[0:i, 0:i, :] * Lrow[None, :, :],
                              axis=1)                     # [i, L]
            S[0:i, i, :] = -contrib * dg_inv[i:i + 1]
            S[i:i + 1, i, :] = dg_inv[i:i + 1]
            if i + 1 < n:
                S[i + 1:, i, :] = jnp.zeros((n - i - 1, L), f32)

    # ---- 3. warm ADMM in factor form ---------------------------------
    def solve_inplace():
        """K^{-1} Yv in place: Yv [n, L] holds rhs, gets solution.

        solve_form="subst": STATIC trailing-slice substitution sweeps
        (half the flops of the masked full-vector form, no
        iota/select/loop bookkeeping).  solve_form="inv": two
        full-array contractions against the in-place factor inverse."""
        if use_inv:
            T = S[:, :, :]                                # [n, n, L]
            b = Yv[:]
            # y = L^-1 b : y[i] = sum_j T[i, j] b[j] = sum_j S[j, i] b[j]
            yv = jnp.sum(T * b[:, None, :], axis=0)
            # x = L^-T y : x[j] = sum_i T[i, j] y[i] = sum_i S[j, i] y[i]
            Yv[:] = jnp.sum(T * yv[None, :, :], axis=1)
            return
        for j in range(n):
            yj = Yv[j:j + 1] * dg_inv[j:j + 1]            # [1, L]
            Yv[j:j + 1] = yj
            if j + 1 < n:
                Yv[j + 1:] = Yv[j + 1:] - S[j, j + 1:, :] * yj
        for j in range(n - 1, -1, -1):
            if j + 1 < n:
                partial = jnp.sum(S[j, j + 1:, :] * Yv[j + 1:],
                                  axis=0, keepdims=True)
            else:
                partial = 0.0
            Yv[j:j + 1] = (Yv[j:j + 1] - partial) * dg_inv[j:j + 1]

    def g_mv(z):
        """G z via constant-operand MXU matmul: [m,n]x[n,L].

        precision=HIGHEST: the TPU MXU default truncates inputs to bf16,
        whose ~1e-2 relative error on O(100 N) forces measurably degrades
        closed-loop height tracking (the same failure class as the
        NOTES.md K^-1 pin) — the 3-pass f32 matmul is required here."""
        return jax.lax.dot_general(
            Gmat_c, z, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)

    def gt_mv(w):
        return jax.lax.dot_general(
            GmatT_c, w, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)

    f_val = f_ref[:]                                      # [n, L]
    v = jnp.minimum(g_mv(zw_ref[:]), h_c)
    y = yw_ref[:]

    def admm_iter(_, carry):
        v, y = carry
        Yv[:] = -f_val + rho * gt_mv(v - y)
        solve_inplace()
        gz = g_mv(Yv[:])
        gzr = alpha * gz + (1.0 - alpha) * v
        v_new = jnp.minimum(gzr + y, h_c)
        y_new = y + gzr - v_new
        return (v_new, y_new)

    if "admm" not in prof_skip:
        v, y = lax.fori_loop(0, iters, admm_iter, (v, y))

    if "solve" not in prof_skip:
        Yv[:] = -f_val + rho * gt_mv(v - y)
        solve_inplace()
    z = Yv[:]

    r_prim = jnp.max(jnp.abs(g_mv(z) - v), axis=0, keepdims=True)
    denom = 1.0 + jnp.max(jnp.abs(f_val), axis=0, keepdims=True)

    z_out[:] = z
    y_out[:] = y
    res_out[:] = r_prim / denom

    if xp_out is not None:
        # one-step state prediction xi_pred = Ad x0 + Bd_0 u0
        if sp is not None:
            xn = sp["ad"](x0)
        else:
            xn = ad[:, 0, :] * x0[0:1]
            for c in range(1, nx):
                xn = xn + ad[:, c, :] * x0[c:c + 1]
        Bd0 = bd_ref[0:nx]                                # [nx, nu, L]
        for u in range(nu):
            xn = xn + Bd0[:, u, :] * z[u:u + 1]
        xp_out[:] = xn


def _mpc_kernel(N: int, nx: int, nu: int, mu_: int, iters: int,
                rho: float, alpha: float, reg: float, solve_form: str,
                # refs (inputs):
                ad_ref, bd_ref, xref_ref, x0_ref, zw_ref, yw_ref,
                qv_ref, pv_ref, dblk_ref, gmat_ref, gmt_ref, h_ref,
                # refs (outputs):
                z_out, y_out, res_out,
                # refs (scratch):
                S, w_ref, qe_ref, f_ref, dg_ref, Yv):
    del reg  # folded into the diagonal-block constant
    _mpc_core(N, nx, nu, mu_, iters, rho, alpha,
              ad_ref[:], bd_ref, lambda j: xref_ref[j], x0_ref[:],
              zw_ref, yw_ref, qv_ref, pv_ref, dblk_ref,
              gmat_ref, gmt_ref, h_ref,
              z_out, y_out, res_out,
              S, w_ref, qe_ref, f_ref, dg_ref, Yv,
              solve_form=solve_form)


def _mpc_kernel_prep(N: int, nx: int, nu: int, mu_: int, iters: int,
                     rho: float, alpha: float,
                     ts: float, mass: float, height_des: float,
                     solve_form: str,
                     # refs (inputs):
                     x0_ref, arms_ref, vdes_ref, wdes_ref,
                     zw_ref, yw_ref, anc_ref,
                     qv_ref, pv_ref, dblk_ref, gmat_ref, gmt_ref, h_ref,
                     iinv_ref,
                     # refs (outputs):
                     z_out, y_out, res_out, xp_out,
                     # refs (scratch):
                     S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s):
    """Prep-fused variant: the SRBD linearization, exact nilpotent ZOH,
    and walking reference are synthesized IN-KERNEL from (x0, arms,
    v_des, yaw_rate) — the XLA-side prep (linearize_shared +
    discretize_srbd + walking_reference) was 6.7 ms at B=4096, over half
    the remaining tick (models/srbd.py documents the same closed forms).
    anc_ref [3, L]: the caller-clipped reference-anchor pose (x, y, yaw)
    (equal to the current pose for the receding reference).
    """
    _prep_mpc(N, nx, nu, mu_, iters, rho, alpha, ts, mass, height_des,
              x0_ref[:], lambda k: arms_ref[k], vdes_ref[:], wdes_ref[:],
              iinv_ref[:],
              zw_ref, yw_ref, qv_ref, pv_ref, dblk_ref,
              gmat_ref, gmt_ref, h_ref,
              z_out, y_out, res_out, xp_out,
              S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s,
              anchor=anc_ref[:], solve_form=solve_form)


def _prep_mpc(N, nx, nu, mu_, iters, rho, alpha, ts, mass, height_des,
              x0, arms_read, vdes, wdes, I_inv,
              zw_ref, yw_ref,
              qv_ref, pv_ref, dblk_ref, gmat_ref, gmt_ref, h_ref,
              z_out, y_out, res_out, xp_out,
              S, w_ref, qe_ref, f_ref, dg_ref, Yv, ad_s, bd_s,
              anchor=None, prof_skip=(), two_feet=False,
              solve_form="subst"):
    """Shared prep+solve core, callable from other kernels (the full-tick
    kernel of ops/tick_fused_pallas.py re-enters here after synthesizing
    the moment arms in-kernel).

    x0 [nx, L] / vdes [3, L] / wdes [1, L] / I_inv [3, 3] are VALUES;
    arms_read(k) -> [3, L] reads horizon-step k's stance-foot position
    (k may be a traced index).  `anchor` [3, L] is the reference pose
    origin (x, y, yaw — the caller-clipped tracking anchor); None = the
    receding reference (origin at x0's pose).

    two_feet=True: the double-support standing form (nu = 6): Bd gains a
    second per-foot column triple and arms_read(k) must return the PAIR
    (arm_l [3, L], arm_r [3, L]) — the stance_mpc QP of
    control/controller.py with a full-stance schedule.
    """
    L = LANES
    f32 = jnp.float32

    yaw = x0[2:3]                                         # [1, L]
    cy = jnp.cos(yaw)
    sy = jnp.sin(yaw)
    zero1 = jnp.zeros_like(cy)
    one1 = jnp.ones_like(cy)

    # ---- Ad = I + Ac ts + Ac^2 ts^2/2 (Ac nilpotent of index 3) -------
    eye_grid = jnp.where(
        lax.broadcasted_iota(jnp.int32, (nx, nx, L), 0)
        == lax.broadcasted_iota(jnp.int32, (nx, nx, L), 1),
        jnp.ones((nx, nx, L), f32), 0.0)
    ad_s[:] = eye_grid
    # rows 0:3, cols 6:9 <- ts * Rz'  (Rz' rows: [c,s,0], [-s,c,0], [0,0,1])
    ad_s[0, 6:9, :] = ts * jnp.concatenate([cy, sy, zero1], axis=0)
    ad_s[1, 6:9, :] = ts * jnp.concatenate([-sy, cy, zero1], axis=0)
    ad_s[2, 8:9, :] = ts * one1
    # rows 3:6, cols 9:12 <- ts * I
    ad_s[3, 9:10, :] = ts * one1
    ad_s[4, 10:11, :] = ts * one1
    ad_s[5, 11:12, :] = ts * one1
    # gravity couplings: Ad[11,12] = ts; Ad[5,12] = ts^2/2
    ad_s[11, 12:13, :] = ts * one1
    ad_s[5, 12:13, :] = (ts * ts / 2.0) * one1
    ad = ad_s[:]

    # ---- I_w^{-1} = Rz I^{-1} Rz' (constant body-inertia inverse) -----
    # M1 = Rz @ I_inv, rows of Rz: [c,-s,0], [s,c,0], [0,0,1].
    # m1_i[k, l] = sum_j Rz[i, j, l] I_inv[j, k]: the [3,1]-shaped
    # constant rows broadcast against the [1,L] lane trig vectors.
    Ii = I_inv[:, :, None]                                # [3,3,1]
    m1_0 = cy * Ii[0] - sy * Ii[1]                        # [3, L]
    m1_1 = sy * Ii[0] + cy * Ii[1]
    m1_2 = jnp.broadcast_to(Ii[2], (3, L))
    # I_w_inv[i, j] = sum_k M1[i, k] Rz[j, k]
    def iw_row(m1_i):
        c0 = cy * m1_i[0:1] - sy * m1_i[1:2]
        c1 = sy * m1_i[0:1] + cy * m1_i[1:2]
        c2 = m1_i[2:3]
        return jnp.concatenate([c0, c1, c2], axis=0)      # [3, L]

    iw0, iw1, iw2 = iw_row(m1_0), iw_row(m1_1), iw_row(m1_2)

    pos = x0[3:6]                                         # [3, L]

    # ---- Bd_k from arms (exact ZOH closed form) -----------------------
    ts2 = ts * ts / 2.0
    eye3L = jnp.where(
        lax.broadcasted_iota(jnp.int32, (3, 3, L), 0)
        == lax.broadcasted_iota(jnp.int32, (3, 3, L), 1),
        jnp.ones((3, 3, L), f32), 0.0)
    n_feet = 2 if two_feet else 1
    eye3rep = jnp.concatenate([eye3L] * n_feet, axis=1)   # [3, nu, L]
    rows35 = (ts2 / mass) * eye3rep
    rows912 = (ts / mass) * eye3rep
    row12 = jnp.zeros((1, nu, L), f32)

    def _foot_cols(r):
        """Per-foot Bd column triple from the moment arm r = p_f - pos:
        (rows03 [3,3,L], rows69 [3,3,L])."""
        rx, ry, rz = r[0:1], r[1:2], r[2:3]
        # skew(r) columns: col0 = (0, rz, -ry), col1 = (-rz, 0, rx),
        # col2 = (ry, -rx, 0); T = I_w_inv @ skew(r):
        # T[i, j] = iw_i . skew_col_j
        def t_row(iw):
            a, b, c = iw[0:1], iw[1:2], iw[2:3]
            t0 = b * rz - c * ry
            t1 = -a * rz + c * rx
            t2 = a * ry - b * rx
            return jnp.concatenate([t0, t1, t2], axis=0)  # [3, L]

        T0, T1, T2 = t_row(iw0), t_row(iw1), t_row(iw2)
        T = jnp.stack([T0, T1, T2], axis=0)               # [3, 3, L]
        # rows 0:3 = ts^2/2 Rz' T  (Rz' rows [c,s,0], [-s,c,0], [0,0,1])
        rt0 = cy[None] * T0[None] + sy[None] * T1[None]   # [1,3,L]
        rt1 = -sy[None] * T0[None] + cy[None] * T1[None]
        rt2 = T2[None]
        return ts2 * jnp.concatenate([rt0, rt1, rt2], axis=0), ts * T

    def bd_step(k):
        if two_feet:
            arm_l, arm_r = arms_read(k)
            c03l, c69l = _foot_cols(arm_l - pos)
            c03r, c69r = _foot_cols(arm_r - pos)
            rows03 = jnp.concatenate([c03l, c03r], axis=1)
            rows69 = jnp.concatenate([c69l, c69r], axis=1)
        else:
            rows03, rows69 = _foot_cols(arms_read(k) - pos)
        Bd_k = jnp.concatenate(
            [rows03, rows35, rows69, rows912, row12], axis=0)
        bd_s[nx * k:nx * (k + 1)] = Bd_k

    if "lin" not in prof_skip:
        # static loop: compile-time bd_s offsets and arms reads
        for k in range(N):
            bd_step(k)

    # ---- walking reference row synthesizer ----------------------------
    # (models/srbd.py:walking_reference: yaw ramp, v_des-integrated
    # position with z pinned at height_des, omega = (0,0,yaw_rate),
    # vel = v_des for rows >= 1 — only rows 1..N are consumed here)
    # ---- structure-exploiting closures for the condensation ----------
    # Ad = I + nilpotent coupling (12 nonzeros); Bd = two dense 3x3
    # blocks (rows 0:3, 6:9) + two scaled identities (rows 3:6, 9:12,
    # compile-time scales) + a zero row.  The closed forms below are
    # EXACT algebra (f32-roundoff-identical to the dense chains) at
    # ~14x / ~1.6x fewer multiplies -- see _mpc_core's sp parameter.
    h2 = ts * ts / 2.0
    s1c = h2 / mass
    s2c = ts / mass

    def _adT(M):
        # Ad' M on the leading index; M [nx, ..., L]
        a, b, c3 = M[0:1], M[1:2], M[2:3]
        r6 = M[6:7] + ts * (cy * a - sy * b)
        r7 = M[7:8] + ts * (sy * a + cy * b)
        r8 = M[8:9] + ts * c3
        r9_11 = M[9:12] + ts * M[3:6]
        r12 = M[12:13] + ts * M[11:12] + h2 * M[5:6]
        return jnp.concatenate([M[0:6], r6, r7, r8, r9_11, r12], axis=0)

    def _ad_right(M):
        # M Ad on the second index; M [r, nx, L]
        c6 = M[:, 6:7] + ts * (cy * M[:, 0:1] - sy * M[:, 1:2])
        c7 = M[:, 7:8] + ts * (sy * M[:, 0:1] + cy * M[:, 1:2])
        c8 = M[:, 8:9] + ts * M[:, 2:3]
        c9_11 = M[:, 9:12] + ts * M[:, 3:6]
        c12 = M[:, 12:13] + ts * M[:, 11:12] + h2 * M[:, 5:6]
        return jnp.concatenate([M[:, 0:6], c6, c7, c8, c9_11, c12],
                               axis=1)

    def _adx(x):
        # Ad x; x [nx, L]
        r0 = x[0:1] + ts * (cy * x[6:7] + sy * x[7:8])
        r1 = x[1:2] + ts * (-sy * x[6:7] + cy * x[7:8])
        r2 = x[2:3] + ts * x[8:9]
        r3_4 = x[3:5] + ts * x[9:11]
        r5 = x[5:6] + ts * x[11:12] + h2 * x[12:13]
        r11 = x[11:12] + ts * x[12:13]
        return jnp.concatenate(
            [r0, r1, r2, r3_4, r5, x[6:11], r11, x[12:13]], axis=0)

    def _bdc(V, j):
        # E[b,a] = sum_x V[x,b] Bd_j[x,a]; V [nx, b, L] -> [b, nu, L]
        # (per-foot column triples share the scaled-identity rows 3:6 /
        # 9:12 — a % 3 indexes the foot-local axis)
        B03 = bd_s[pl.ds(nx * j, 3)]                      # [3, nu, L]
        B69 = bd_s[pl.ds(nx * j + 6, 3)]                  # [3, nu, L]
        cols = []
        for a in range(nu):
            a3 = a % 3
            acc = s1c * V[3 + a3] + s2c * V[9 + a3]       # [b, L]
            for x in range(3):
                acc = acc + V[x] * B03[x, a] + V[6 + x] * B69[x, a]
            cols.append(acc[:, None, :])
        return jnp.concatenate(cols, axis=1)

    sp = {"adT": _adT, "ad_right": _ad_right, "ad": _adx, "bdc": _bdc}

    # anchor [3, L] = (x, y, yaw) pose origin of the reference ramps;
    # None = fully receding (origin at x0's pose).  The yaw row is the
    # round-5 heading integral action (cfg.yaw_anchor_band) — the
    # linearization above stays at the MEASURED yaw (operating point).
    ref_origin_xy = x0[3:5] if anchor is None else anchor[0:2]
    ref_origin_yaw = yaw if anchor is None else anchor[2:3]

    def ref_row(jp1):
        t = jp1.astype(f32) * ts if hasattr(jp1, "astype") \
            else jnp.float32(jp1) * ts
        yaw_r = ref_origin_yaw + t * wdes                 # [1, L]
        xy = ref_origin_xy + t * vdes[0:2]                # [2, L]
        zrow = jnp.full((1, L), height_des, f32)
        omega = jnp.concatenate([zero1, zero1, wdes], axis=0)
        # roll/pitch reference = LEVEL (srbd.walking_reference
        # attitude_ref="level"): a receding attitude reference (x0[0:2],
        # the include/mpcQP.h:74-97 form) only damps angular rate, and
        # the round-5 60k-tick soak showed the resulting free pitch walk
        # (~0.023 rad/s bias) collapses the gait at ~41 s.  Configs with
        # attitude_ref="receding" are parity-only and never dispatch
        # here (make_walking_fused / supports_fused_tick guard).
        rp = jnp.zeros((2, L), f32)
        return jnp.concatenate(
            [rp, yaw_r, xy, zrow, omega, vdes, x0[12:13]], axis=0)

    _mpc_core(N, nx, nu, mu_, iters, rho, alpha,
              ad, bd_s, ref_row, x0,
              zw_ref, yw_ref, qv_ref, pv_ref, dblk_ref,
              gmat_ref, gmt_ref, h_ref,
              z_out, y_out, res_out,
              S, w_ref, qe_ref, f_ref, dg_ref, Yv,
              xp_out=xp_out, sp=sp, prof_skip=prof_skip,
              solve_form=solve_form)


def _ad_t_vec(ad, s, nx: int):
    """(Ad' s)[y,l] = sum_x Ad[x,y,l] s[x,l]."""
    acc = ad[0] * s[0:1]
    for x in range(1, nx):
        acc = acc + ad[x] * s[x:x + 1]
    return acc


def _pad_batch(x, B_pad, fill=0.0):
    B = x.shape[0]
    if B == B_pad:
        return x
    pad = [(0, B_pad - B)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad, constant_values=fill)


@functools.partial(
    jax.jit, static_argnames=("N", "iters", "rho", "alpha", "reg",
                              "q_diag", "r_diag", "p_diag", "Gu", "h",
                              "interpret", "solve_form"))
def fused_walking_qp(Ad, Bd_t, x_ref, x0, z_warm, y_warm, *,
                     N: int, iters: int, rho: float, alpha: float,
                     reg: float, q_diag, r_diag, p_diag, Gu, h,
                     solve_form: str = "subst",
                     interpret: bool = False):
    """Batched fused condensation + warm-ADMM GRF solve.

    Ad [B,nx,nx]; Bd_t [B,N,nx,nu]; x_ref [B,N+1,nx]; x0 [B,nx];
    z_warm [B,N*nu]; y_warm [B,N*mu].  Static: the diagonal weights,
    cone rows Gu [mu][nu] and bounds h [N*mu] as nested tuples.
    Returns (z [B,n], y [B,m], residual [B]).
    """
    B = Ad.shape[0]
    nx = Ad.shape[-1]
    nu = Bd_t.shape[-1]
    mu_ = len(Gu)
    n = N * nu
    m = N * mu_
    f32 = jnp.float32

    B_pad = ((B + LANES - 1) // LANES) * LANES
    Ad = _pad_batch(Ad, B_pad)
    # padded lanes get Ad = I to keep the Cholesky positive definite
    if B_pad != B:
        eye = jnp.eye(nx, dtype=f32)
        lane = jnp.arange(B_pad)[:, None, None]
        Ad = Ad + jnp.where(lane >= B, eye, 0.0)
    Bd_t = _pad_batch(Bd_t, B_pad)
    x_ref = _pad_batch(x_ref, B_pad)
    x0 = _pad_batch(x0, B_pad)
    z_warm = _pad_batch(z_warm, B_pad)
    y_warm = _pad_batch(y_warm, B_pad)

    # batch-last layouts
    ad_t = jnp.transpose(Ad, (1, 2, 0)).astype(f32)            # [nx,nx,B]
    bd_flat = jnp.transpose(Bd_t, (1, 2, 3, 0)).reshape(
        N * nx, nu, B_pad).astype(f32)                         # [N*nx,nu,B]
    xr_t = jnp.transpose(x_ref, (1, 2, 0)).astype(f32)         # [N+1,nx,B]
    x0_t = jnp.transpose(x0, (1, 0)).astype(f32)               # [nx,B]
    zw_t = jnp.transpose(z_warm, (1, 0)).astype(f32)           # [n,B]
    yw_t = jnp.transpose(y_warm, (1, 0)).astype(f32)           # [m,B]

    kernel = functools.partial(
        _mpc_kernel, N, nx, nu, mu_, iters, float(rho), float(alpha),
        float(reg), str(solve_form))

    # batch-invariant constant inputs (pallas kernels may not capture
    # array constants — they are passed as replicated blocks instead)
    q_np = np.asarray(q_diag, np.float32)[:, None]
    p_np = np.asarray(p_diag, np.float32)[:, None]
    Gu_np = np.asarray(Gu, np.float32)
    dblk_np = (2.0 * np.diag(np.asarray(r_diag, np.float32))
               + float(rho) * (Gu_np.T @ Gu_np)
               + float(reg) * np.eye(nu, dtype=np.float32))
    gmat_np = np.kron(np.eye(N, dtype=np.float32), Gu_np)      # [m, n]
    h_np = np.asarray(h, np.float32)[:, None]

    grid = (B_pad // LANES,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (*shape, LANES),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, (lambda i, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM)

    z_t, y_t, res_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((nx, nx)),        # ad
            spec((N * nx, nu)),    # bd
            spec((N + 1, nx)),     # x_ref
            spec((nx,)),           # x0
            spec((n,)),            # z_warm
            spec((m,)),            # y_warm
            const_spec((nx, 1)),   # q_diag
            const_spec((nx, 1)),   # p_diag
            const_spec((nu, nu)),  # diag block
            const_spec((m, n)),    # Gmat
            const_spec((n, m)),    # Gmat'
            const_spec((m, 1)),    # h
        ],
        out_specs=(spec((n,)), spec((m,)), spec((1,))),
        out_shape=(
            jax.ShapeDtypeStruct((n, B_pad), f32),
            jax.ShapeDtypeStruct((m, B_pad), f32),
            jax.ShapeDtypeStruct((1, B_pad), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), f32),        # S
            pltpu.VMEM((N * nx, nx, LANES), f32),  # w_ref
            pltpu.VMEM((N, nx, LANES), f32),       # qe_ref
            pltpu.VMEM((n, LANES), f32),           # f_ref
            pltpu.VMEM((n, LANES), f32),           # dg_ref
            pltpu.VMEM((n, LANES), f32),           # Yv
        ],
        compiler_params=pltpu.CompilerParams(
            # the condensed-horizon working set (condensation
            # scratch + S factor + ADMM state, 128-lane batched)
            # can exceed the 16 MB default scoped-vmem limit at
            # larger horizons; v5e VMEM is 128 MB, allow 64 MB
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(ad_t, bd_flat, xr_t, x0_t, zw_t, yw_t,
      jnp.asarray(q_np), jnp.asarray(p_np), jnp.asarray(dblk_np),
      jnp.asarray(gmat_np), jnp.asarray(gmat_np.T), jnp.asarray(h_np))

    z = jnp.transpose(z_t, (1, 0))[:B]
    y = jnp.transpose(y_t, (1, 0))[:B]
    res = res_t[0, :B]
    return z, y, res


@functools.partial(
    jax.jit, static_argnames=("N", "iters", "rho", "alpha", "reg",
                              "ts", "mass", "height_des",
                              "q_diag", "r_diag", "p_diag", "Gu", "h",
                              "inertia", "interpret", "solve_form"))
def fused_walking_qp_prep(arms, x0, v_des, yaw_rate, z_warm, y_warm,
                          anchor, *, solve_form: str = "subst",
                          N: int, iters: int, rho: float, alpha: float,
                          reg: float, ts: float, mass: float,
                          height_des: float, q_diag, r_diag, p_diag,
                          Gu, h, inertia, interpret: bool = False):
    """Prep-fused batched solve: SRBD linearization + ZOH + reference are
    synthesized inside the kernel.

    arms [B,N,3] (world stance-foot position per horizon step);
    x0 [B,nx]; v_des [B,3]; yaw_rate [B]; anchor [B,3] = (x, y, yaw)
    reference-pose origin; warm state as usual.
    `inertia` is the 3x3 body inertia as a nested tuple.
    Returns (z [B,n], y [B,m], residual [B], xi_pred [B,nx]).
    """
    B = x0.shape[0]
    nx = x0.shape[-1]
    nu = 3
    mu_ = len(Gu)
    n = N * nu
    m = N * mu_
    f32 = jnp.float32

    B_pad = ((B + LANES - 1) // LANES) * LANES
    arms = _pad_batch(arms, B_pad)
    x0 = _pad_batch(x0, B_pad)
    v_des = _pad_batch(v_des, B_pad)
    yaw_rate = _pad_batch(yaw_rate, B_pad)
    z_warm = _pad_batch(z_warm, B_pad)
    y_warm = _pad_batch(y_warm, B_pad)
    anchor = _pad_batch(anchor, B_pad)

    arms_t = jnp.transpose(arms, (1, 2, 0)).astype(f32)        # [N,3,B]
    x0_t = jnp.transpose(x0, (1, 0)).astype(f32)               # [nx,B]
    vdes_t = jnp.transpose(v_des, (1, 0)).astype(f32)          # [3,B]
    wdes_t = yaw_rate[None].astype(f32)                        # [1,B]
    zw_t = jnp.transpose(z_warm, (1, 0)).astype(f32)
    yw_t = jnp.transpose(y_warm, (1, 0)).astype(f32)
    anc_t = jnp.transpose(anchor, (1, 0)).astype(f32)          # [3,B]

    q_np = np.asarray(q_diag, np.float32)[:, None]
    p_np = np.asarray(p_diag, np.float32)[:, None]
    Gu_np = np.asarray(Gu, np.float32)
    dblk_np = (2.0 * np.diag(np.asarray(r_diag, np.float32))
               + float(rho) * (Gu_np.T @ Gu_np)
               + float(reg) * np.eye(nu, dtype=np.float32))
    gmat_np = np.kron(np.eye(N, dtype=np.float32), Gu_np)
    h_np = np.asarray(h, np.float32)[:, None]
    iinv_np = np.linalg.inv(
        np.asarray(inertia, np.float64).reshape(3, 3)).astype(np.float32)

    kernel = functools.partial(
        _mpc_kernel_prep, N, nx, nu, mu_, iters, float(rho), float(alpha),
        float(ts), float(mass), float(height_des), str(solve_form))

    grid = (B_pad // LANES,)

    def spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            (*shape, LANES),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape, (lambda i, _nd=nd: (0,) * _nd),
            memory_space=pltpu.VMEM)

    z_t, y_t, res_t, xp_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            spec((nx,)),           # x0
            spec((N, 3)),          # arms
            spec((3,)),            # v_des
            spec((1,)),            # yaw_rate
            spec((n,)),            # z_warm
            spec((m,)),            # y_warm
            spec((3,)),            # reference-anchor pose (x, y, yaw)
            const_spec((nx, 1)),   # q_diag
            const_spec((nx, 1)),   # p_diag
            const_spec((nu, nu)),  # diag block
            const_spec((m, n)),    # Gmat
            const_spec((n, m)),    # Gmat'
            const_spec((m, 1)),    # h
            const_spec((3, 3)),    # I^{-1}
        ],
        out_specs=(spec((n,)), spec((m,)), spec((1,)), spec((nx,))),
        out_shape=(
            jax.ShapeDtypeStruct((n, B_pad), f32),
            jax.ShapeDtypeStruct((m, B_pad), f32),
            jax.ShapeDtypeStruct((1, B_pad), f32),
            jax.ShapeDtypeStruct((nx, B_pad), f32),
        ),
        scratch_shapes=[
            pltpu.VMEM((n, n, LANES), f32),        # S
            pltpu.VMEM((N * nx, nx, LANES), f32),  # w_ref
            pltpu.VMEM((N, nx, LANES), f32),       # qe_ref
            pltpu.VMEM((n, LANES), f32),           # f_ref
            pltpu.VMEM((n, LANES), f32),           # dg_ref
            pltpu.VMEM((n, LANES), f32),           # Yv
            pltpu.VMEM((nx, nx, LANES), f32),      # ad_s
            pltpu.VMEM((N * nx, nu, LANES), f32),  # bd_s
        ],
        compiler_params=pltpu.CompilerParams(
            # the condensed-horizon working set (condensation
            # scratch + S factor + ADMM state, 128-lane batched)
            # can exceed the 16 MB default scoped-vmem limit at
            # larger horizons; v5e VMEM is 128 MB, allow 64 MB
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x0_t, arms_t, vdes_t, wdes_t, zw_t, yw_t, anc_t,
      jnp.asarray(q_np), jnp.asarray(p_np), jnp.asarray(dblk_np),
      jnp.asarray(gmat_np), jnp.asarray(gmat_np.T), jnp.asarray(h_np),
      jnp.asarray(iinv_np))

    z = jnp.transpose(z_t, (1, 0))[:B]
    y = jnp.transpose(y_t, (1, 0))[:B]
    res = res_t[0, :B]
    xp = jnp.transpose(xp_t, (1, 0))[:B]
    return z, y, res, xp


def make_walking_fused(cfg, use_pallas=None):
    """Prep-fused warm walking GRF solver from the FULL controller
    config: fn(arms, x0, v_des, yaw_rate, z_warm, y_warm, anchor) ->
    (QPSolution, xi_pred, (z, y)).  anchor [3] = (x, y, yaw) is the
    reference pose origin (pass x0's xy + yaw for the fully receding
    reference).

    arms [N,3] per scenario (vmap for batches).  Off-TPU the vmap rule
    runs the XLA composition (srbd linearize/ZOH/reference + condense +
    _batched_admm); on TPU the whole pipeline is one Pallas kernel.
    """
    from mpc_limx_control_tpu.models import srbd as _srbd
    from mpc_limx_control_tpu.ops import condense as _cnd
    from mpc_limx_control_tpu.ops import qp as _qps

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    c = cfg.srbd
    if use_pallas and c.attitude_ref != "level":
        # the in-kernel ref_row is level-attitude only (the receding
        # form is a parity option served by the XLA composition)
        use_pallas = False
    N = c.horizon
    mu = float(c.friction_mu)
    Gu = ((1.0, 0.0, -mu), (-1.0, 0.0, -mu),
          (0.0, 1.0, -mu), (0.0, -1.0, -mu),
          (0.0, 0.0, 1.0), (0.0, 0.0, -1.0))
    hu = (0.0, 0.0, 0.0, 0.0, float(c.fz_max), -float(c.fz_min))
    h = tuple(hu) * N
    q_diag = tuple(float(v) for v in c.q_diag)
    r_diag = tuple(float(v) for v in c.r_diag)
    p_diag = tuple(float(c.p_scale) * float(v) for v in c.q_diag)
    iters = int(c.solver.admm_warm_iters)
    solve_form = str(getattr(c.solver, 'solve_form', 'subst'))
    rho = float(c.solver.admm_rho)
    alpha = float(c.solver.admm_alpha)
    reg = 1e-6
    ts = float(c.ts)
    mass = float(cfg.robot.mass)
    height_des = float(cfg.ground_height) + float(cfg.base_height)
    inertia = tuple(float(v) for v in np.asarray(
        cfg.robot.inertia, np.float64).reshape(-1))

    def _xla_batched(arms, x0, v_des, yaw_rate, z_warm, y_warm, anc):
        dtype = x0.dtype
        B = x0.shape[0]
        Ac, Bc_t = jax.vmap(lambda a, p, yw: _srbd.linearize_shared(
            cfg.robot, a, p, yw, dtype))(arms, x0[:, 3:6], x0[:, 2])
        Ad, Bd_t = _srbd.discretize_srbd(Ac, Bc_t, ts)
        anc3 = jnp.concatenate(
            [anc[:, :2], jnp.zeros_like(anc[:, :1])], -1)
        x_ref = jax.vmap(lambda xx, vv, ww, aa, ya: _srbd.walking_reference(
            xx, c, N, vv, ww, height_des=height_des,
            pos_anchor=aa, yaw_anchor=ya))(x0, v_des, yaw_rate, anc3,
                                           anc[:, 2])
        Q = jnp.diag(jnp.asarray(q_diag, dtype))
        R = jnp.diag(jnp.asarray(r_diag, dtype))
        P = jnp.diag(jnp.asarray(p_diag, dtype))
        G = jnp.kron(jnp.eye(N, dtype=dtype), jnp.asarray(Gu, dtype))
        hv = jnp.asarray(h, dtype)
        qp = jax.vmap(lambda a, b, xr, xx: _cnd.condense(
            a, b, Q, R, P, N, xx, xr, None, None,
            extra_G=G, extra_h=hv))(Ad, Bd_t, x_ref, x0)
        sol, zy = _qps._batched_admm(
            qp.H, qp.f, jnp.broadcast_to(G, (B, *G.shape)),
            jnp.broadcast_to(hv, (B, *hv.shape)),
            z_warm, y_warm, iters, rho, alpha, False)
        u0 = sol.u[:, :3]
        xp = (jnp.einsum("bxy,by->bx", Ad, x0)
              + jnp.einsum("bxu,bu->bx", Bd_t[:, 0], u0))
        return sol, xp, zy

    @jax.custom_batching.custom_vmap
    def solve(arms, x0, v_des, yaw_rate, z_warm, y_warm, anchor):
        sol, xp, zy = _xla_batched(
            arms[None], x0[None], v_des[None], yaw_rate[None],
            z_warm[None], y_warm[None], anchor[None])
        return (QPSolution(u=sol.u[0], iterations=sol.iterations,
                           residual=sol.residual[0]),
                xp[0], (zy[0][0], zy[1][0]))

    @solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a, (axis_size, *a.shape))
                for a, b in zip(args, in_batched)]
        arms, x0, v_des, yaw_rate, z_warm, y_warm, anchor = args
        if use_pallas:
            z, y, res, xp = fused_walking_qp_prep(
                arms, x0, v_des, yaw_rate, z_warm, y_warm, anchor,
                N=N, iters=iters, rho=rho, alpha=alpha, reg=reg,
                ts=ts, mass=mass, height_des=height_des,
                q_diag=q_diag, r_diag=r_diag, p_diag=p_diag,
                Gu=Gu, h=h, inertia=inertia, solve_form=solve_form,
                interpret=use_pallas == "interpret")
            sol = QPSolution(u=z, iterations=iters, residual=res)
            zy = (z, y)
        else:
            sol, xp, zy = _xla_batched(arms, x0, v_des, yaw_rate,
                                       z_warm, y_warm, anchor)
        spec = (QPSolution(u=True, iterations=False, residual=True),
                True, (True, True))
        return (sol, xp, zy), spec

    return solve


def make_admm_fused(cfg_srbd, use_pallas=None, two_feet: bool = False):
    """Warm-started fused condensation+ADMM solver for the stance GRF QP:
    fn(Ad, Bd_t, x_ref, x0, z_warm, y_warm) -> (QPSolution, (z, y)).

    two_feet=False: the single-support walking form (nu = 3, one cone).
    two_feet=True: the double-support standing form (nu = 6, block-diag
    cone for both feet, input weights duplicated) — the stance_mpc QP of
    control/controller.py with a full-stance schedule.

    All weights/cone constants come from the SRBDConfig (compile-time
    Python floats — nothing traced is closed over, which is what broke
    the round-1 custom_vmap kron variant).  The unbatched path runs the
    XLA reference composition (condense + _batched_admm); vmap dispatches
    to the fused Pallas kernel.
    """
    import numpy as _np

    from mpc_limx_control_tpu.ops import condense as _cnd
    from mpc_limx_control_tpu.ops import qp as _qps

    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"

    c = cfg_srbd
    N = c.horizon
    mu = float(c.friction_mu)
    Gu1 = np.asarray(((1.0, 0.0, -mu), (-1.0, 0.0, -mu),
                      (0.0, 1.0, -mu), (0.0, -1.0, -mu),
                      (0.0, 0.0, 1.0), (0.0, 0.0, -1.0)), np.float32)
    hu1 = (0.0, 0.0, 0.0, 0.0, float(c.fz_max), -float(c.fz_min))
    r1 = tuple(float(v) for v in c.r_diag)
    if two_feet:
        Gu_np = np.zeros((12, 6), np.float32)
        Gu_np[:6, :3] = Gu1
        Gu_np[6:, 3:] = Gu1
        Gu = tuple(tuple(float(v) for v in row) for row in Gu_np)
        hu = tuple(hu1) * 2
        r_diag = r1 * 2
    else:
        Gu = tuple(tuple(float(v) for v in row) for row in Gu1)
        hu = tuple(hu1)
        r_diag = r1
    h = tuple(hu) * N
    q_diag = tuple(float(v) for v in c.q_diag)
    p_diag = tuple(float(c.p_scale) * float(v) for v in c.q_diag)
    iters = int(c.solver.admm_warm_iters)
    solve_form = str(getattr(c.solver, 'solve_form', 'subst'))
    rho = float(c.solver.admm_rho)
    alpha = float(c.solver.admm_alpha)
    reg = 1e-6

    def _xla_batched(Ad, Bd_t, x_ref, x0, z_warm, y_warm):
        """Batched XLA composition (condense + _batched_admm): the
        reference semantics, used off-TPU and for unbatched calls."""
        dtype = x0.dtype
        B = x0.shape[0]
        Q = jnp.diag(jnp.asarray(q_diag, dtype))
        R = jnp.diag(jnp.asarray(r_diag, dtype))
        P = jnp.diag(jnp.asarray(p_diag, dtype))
        G = jnp.kron(jnp.eye(N, dtype=dtype), jnp.asarray(Gu, dtype))
        hv = jnp.asarray(h, dtype)
        qp = jax.vmap(lambda a, b, xr, xx: _cnd.condense(
            a, b, Q, R, P, N, xx, xr, None, None,
            extra_G=G, extra_h=hv))(Ad, Bd_t, x_ref, x0)
        return _qps._batched_admm(
            qp.H, qp.f, jnp.broadcast_to(G, (B, *G.shape)),
            jnp.broadcast_to(hv, (B, *hv.shape)),
            z_warm, y_warm, iters, rho, alpha, False)

    @jax.custom_batching.custom_vmap
    def solve(Ad, Bd_t, x_ref, x0, z_warm, y_warm):
        sol, zy = _xla_batched(Ad[None], Bd_t[None], x_ref[None],
                               x0[None], z_warm[None], y_warm[None])
        return (QPSolution(u=sol.u[0], iterations=sol.iterations,
                           residual=sol.residual[0]),
                (zy[0][0], zy[1][0]))

    @solve.def_vmap
    def _rule(axis_size, in_batched, *args):
        args = [a if b else jnp.broadcast_to(a, (axis_size, *a.shape))
                for a, b in zip(args, in_batched)]
        Ad, Bd_t, x_ref, x0, z_warm, y_warm = args
        if use_pallas:
            # use_pallas == "interpret" runs the kernel through the
            # pallas interpreter (off-TPU kernel coverage in tests)
            z, y, res = fused_walking_qp(
                Ad, Bd_t, x_ref, x0, z_warm, y_warm,
                N=N, iters=iters, rho=rho, alpha=alpha, reg=reg,
                q_diag=q_diag, r_diag=r_diag, p_diag=p_diag, Gu=Gu, h=h,
                solve_form=solve_form,
                interpret=use_pallas == "interpret")
            sol = QPSolution(u=z, iterations=iters, residual=res)
            zy = (z, y)
        else:
            # off-TPU (CPU tests, multichip dryrun): the interpreter-mode
            # kernel is orders of magnitude too slow for closed-loop
            # suites -- run the equivalent XLA composition instead.  The
            # kernel itself is still covered off-TPU by the explicit
            # interpret-mode tests (tests/test_mpc_fused.py).
            sol, zy = _xla_batched(Ad, Bd_t, x_ref, x0, z_warm, y_warm)
        spec = (QPSolution(u=True, iterations=False, residual=True),
                (True, True))
        return (sol, zy), spec

    del _np
    return solve
