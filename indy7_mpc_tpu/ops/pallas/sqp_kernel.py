"""The batched SQP solve as ONE Pallas TPU kernel per lane tile.

This is the framework's production core — the TPU-native equivalent of the
reference's CUDA ``SQPSolverfloat_B.solve`` (a single fused GPU solver,
gato_controller.py:93-103).  Measured on this TPU stack, individual XLA
ops cost ~1 us each regardless of size (no cross-op fusion through the
runtime), while Pallas kernel bodies execute at hardware speed; so the
entire solve — per-knot linearization with folded tangent JVPs, cost
blocks, the Riccati backward/forward sweep, and the 8-alpha merit line
search — lives inside one kernel, with the lane batch riding the
128-wide vector lanes.

Numerics inside the kernel avoid multi-pass VPU ops entirely:
polynomial sincos, sqrt-free LDL^T, bit-trick fast_sqrt for merit norms
(ops/lane_rbd.py helpers — all shape-generic, reused verbatim here).

Semantics match solvers/sqp.py (Gauss-Newton formulation):
  * linearization A/B via the RNEA-transpose identity (osqp_solver.py:70-81
    structure);
  * GN cost blocks with adaptive dQ/R scaling (osqp_solver.py:103-135);
  * merit = tracking cost + mu * (Euler defect + initial-state deviation),
    8 halving alphas, first acceptance wins (osqp_sqp.py:49-74);
  * per-lane masked iteration with step-norm exit (osqp_sqp.py:90-91) and
    Levenberg rho on rejection (reference rho state,
    gato_controller.py:131-138).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import CostConfig, SQPConfig
from ...models.robot import RobotModel
from .. import lane_rbd as LR
from ..lane_sqp import _csum, _matvec

NX, NQ, NU = 12, 6, 6


def _rows(arr, n):
    return [arr[i] for i in range(n)]


def _stackT(vals, T, dtype):
    """Stack a list that may contain Python-float zeros into (len, T)."""
    return jnp.stack(
        [
            v if hasattr(v, "shape") and v.shape == (T,)
            else jnp.broadcast_to(jnp.asarray(v, dtype), (T,))
            for v in vals
        ]
    )


def _bc(comp, shape):
    return jnp.broadcast_to(comp, shape)


# ---------------------------------------------------------------------------
# Per-knot linearization + cost data (runs inside the kernel).
# ---------------------------------------------------------------------------

def _barrier_knot(sm, cfg, q):
    """Joint-range barrier data (ops/kkt.py barrier_terms semantics):
    (value, gradient list NQ, GN Hessian-diagonal list NQ), elementwise
    over each component's trailing shape.  Zero everywhere strictly
    inside the margin band, so interior lanes are numerically unchanged.
    """
    w = cfg.q_barrier
    cb = None
    gb, hb = [], []
    for i in range(NQ):
        hi = float(sm.q_upper[i]) - cfg.q_barrier_margin
        lo = float(sm.q_lower[i]) + cfg.q_barrier_margin
        d_hi = jnp.maximum(q[i] - hi, 0.0)
        d_lo = jnp.maximum(lo - q[i], 0.0)
        term = w * (d_hi * d_hi + d_lo * d_lo)
        cb = term if cb is None else cb + term
        gb.append(2.0 * w * (d_hi - d_lo))
        hb.append(
            2.0 * w
            * jnp.logical_or(d_hi > 0.0, d_lo > 0.0).astype(q[i].dtype)
        )
    return cb, gb, hb


def _linearize_knot(sm, cfg, dt, x, u, w, goal):
    """All per-knot data for one (12, T) state slice.

    Returns (da (list 6 of (12, T): row t = d a_i / d x_t), minv (6x6 list
    of (T,)), xnext (12, T), qvec (12, T) cost gradient, scale2 (2, T):
    [2 dQmod, 2 Rmod], J rows (18, T), base_cost (T,)).

    ``base_cost`` is this knot's contribution to the alpha=0
    (current-trajectory) merit cost — err^2 + dQ v^2 + R u^2 — a free
    byproduct of the cost evaluation that lets the line search fold only
    the 8 nonzero alpha candidates.
    """
    trail = x.shape[1:]  # (T,) per-knot, or (Nm1, T) with knots folded
    dtype = x.dtype
    q = _rows(x, NQ)
    v = [x[NQ + i] for i in range(NQ)]
    uu = _rows(u, NU)
    wr = _rows(w, 6) if w is not None else None

    fe = LR.world_wrench_to_ee(sm, q, wr) if wr is not None else None
    a, fac = LR.forward_dynamics(sm, q, v, uu, f_ext_ee=fe)

    # M^-1 columns from the LDL factor (da/du = M^-1).
    minv = [[None] * NU for _ in range(NU)]
    for j in range(NU):
        col = LR.chol6_solve(fac, [1.0 if i == j else 0.0 for i in range(NU)])
        for i in range(NU):
            minv[i][j] = col[i]

    # Folded tangent pass: d RNEA(q, v, a*; f_ext(q)) for 12 directions at
    # once — components are (12,) + trail, the leading axis indexing
    # tangents.
    tshape = (NX,) + trail
    prim = tuple(_bc(x[c][None], tshape) for c in range(NX))
    # Basis tangents via iota comparison (array literals can't be captured
    # inside a pallas kernel body).
    row_id = jax.lax.broadcasted_iota(jnp.int32, tshape, 0)
    tang = tuple(
        (row_id == c).astype(dtype) for c in range(NX)
    )
    a_star = [_bc(a[i][None], tshape) for i in range(NQ)]

    def tau_of(xin):
        q_ = list(xin[:NQ])
        v_ = list(xin[NQ:])
        fe_ = None
        if wr is not None:
            wb = [_bc(wr[i][None], tshape) for i in range(6)]
            fe_ = LR.world_wrench_to_ee(sm, q_, wb)
        return tuple(LR.rnea(sm, q_, v_, a_star, f_ext_ee=fe_))

    _, dtau = jax.jvp(tau_of, (prim,), (tang,))
    # da/dx = -M^-1 dtau: one LDL solve broadcast over the tangent axis.
    sol = LR.chol6_solve(fac, list(dtau))
    da = [-sol[i] for i in range(NQ)]  # each (12, T)

    xnext = jnp.concatenate(
        [
            jnp.stack([q[i] + dt * v[i] for i in range(NQ)]),
            jnp.stack([v[i] + dt * a[i] for i in range(NQ)]),
        ]
    )

    # Cost data: EE position, Jacobian, GN gradient, adaptive scales.
    eep, cols = LR.ee_pos_jacobian(sm, q)
    err = [eep[i] - goal[i] for i in range(3)]
    err2 = err[0] ** 2 + err[1] ** 2 + err[2] ** 2
    err_norm = LR.fast_sqrt(err2)
    if cfg.regularize:
        scale = 1.0 / (err_norm + cfg.eps)
    else:
        scale = jnp.ones_like(err_norm)
    twodQ = 2.0 * cfg.dQ * scale
    twoR = 2.0 * cfg.R * scale
    # qvec = [2 Qmod J^T err ; 2 dQmod v]; Qmod = 1 at running knots (the
    # terminal knot's QN factor is applied by the caller).  The barrier
    # gradient rides the position part (it scales with Qmod, matching
    # ops/kkt.py cost_blocks_gn); its Hessian diagonal rides scale2
    # rows 2..7 into the backward sweep's _q_cols.
    gp = [2.0 * LR.dot3(cols[i], err) for i in range(NQ)]
    v2 = sum(v[i] * v[i] for i in range(NQ))
    u2 = sum(uu[i] * uu[i] for i in range(NU))
    base_cost = (err2 + cfg.dQ * v2) + cfg.R * u2
    if cfg.q_barrier:
        cb, gb, hb = _barrier_knot(sm, cfg, q)
        gp = [gp[i] + gb[i] for i in range(NQ)]
        base_cost = base_cost + cb
    else:
        hb = [jnp.zeros_like(twodQ) for _ in range(NQ)]
    qvec = jnp.concatenate(
        [jnp.stack(gp), jnp.stack([twodQ * v[i] for i in range(NQ)])]
    )
    # J rows stored a-major: row a*6+i = J[a][i] (matches _q_cols).
    Jrows = jnp.stack([cols[i][a] for a in range(3) for i in range(NQ)])
    scale2 = jnp.stack([twodQ, twoR] + hb)
    return da, minv, xnext, qvec, scale2, Jrows, base_cost


def _cost_knot(sm, cfg, goal, x):
    """(qvec, scale2, Jrows, base_cost) for the terminal knot.

    ``base_cost`` is the terminal knot's alpha=0 merit contribution
    QN err^2 + dQ v^2 (the caller's merit applies QN to err^2 only,
    mirroring osqp_sqp.py eepos_cost terminal weighting).
    """
    q = _rows(x, NQ)
    v = [x[NQ + i] for i in range(NQ)]
    eep, cols = LR.ee_pos_jacobian(sm, q)
    err = [eep[i] - goal[i] for i in range(3)]
    err2 = err[0] ** 2 + err[1] ** 2 + err[2] ** 2
    err_norm = LR.fast_sqrt(err2)
    if cfg.regularize:
        scale = 1.0 / (err_norm + cfg.eps)
    else:
        scale = jnp.ones_like(err_norm)
    twodQ = 2.0 * cfg.dQ * scale
    twoR = 2.0 * cfg.R * scale
    gp = [2.0 * LR.dot3(cols[i], err) for i in range(NQ)]
    v2 = sum(v[i] * v[i] for i in range(NQ))
    base_cost = cfg.QN * err2 + cfg.dQ * v2
    if cfg.q_barrier:
        cb, gb, hb = _barrier_knot(sm, cfg, q)
        gp = [gp[i] + gb[i] for i in range(NQ)]  # s0 applies the QN factor
        base_cost = base_cost + cfg.QN * cb
    else:
        hb = [jnp.zeros_like(twodQ) for _ in range(NQ)]
    qvec = jnp.concatenate(
        [jnp.stack(gp), jnp.stack([twodQ * v[i] for i in range(NQ)])]
    )
    Jrows = jnp.stack([cols[i][a] for a in range(3) for i in range(NQ)])
    return qvec, jnp.stack([twodQ, twoR] + hb), Jrows, base_cost


def _A_from_dtda(dtda_flat, dt):
    """Dense A nested list from stored dt*da rows (72, T)."""
    A = [[0.0] * NX for _ in range(NX)]
    for i in range(NQ):
        A[i][i] = 1.0
        A[i][NQ + i] = dt
    for i in range(NQ):
        for j in range(NX):
            A[NQ + i][j] = dtda_flat[i * NX + j]
        A[NQ + i][NQ + i] = A[NQ + i][NQ + i] + 1.0
    return A


def _B_from_dtminv(dtminv_flat):
    B = [[0.0] * NU for _ in range(NX)]
    for i in range(NQ):
        for j in range(NU):
            B[NQ + i][j] = dtminv_flat[i * NU + j]
    return B


# ---------------------------------------------------------------------------
# The kernel.
# ---------------------------------------------------------------------------

def _sqp_kernel(
    sm,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    dt: float,
    N: int,
    use_wrench: bool,
    stages: int,
    # refs:
    xs_ref, goals_ref, X_ref, U_ref, w_ref, rho_ref,
    Xo_ref, Uo_ref, rhoo_ref, alpha_ref, step_ref,
    da_scr, minv_scr, d_scr, qv_scr, sc_scr, J_scr,
    K_scr, kff_scr, dX_scr, dU_scr, S_scr,
):
    T = xs_ref.shape[-1]
    dtype = jnp.float32
    Nm1 = N - 1
    mu = sqp_cfg.merit_mu
    alphas = [0.5**i for i in range(sqp_cfg.num_alphas)]
    # (num_alphas, 1) candidate scales, built op-wise (no array literals).
    # The alpha=0 base merit comes free from stage 1, so only the nonzero
    # candidates fold into the line-search batch (8 rows = one sublane
    # tile instead of two at 9).
    cand_id = jax.lax.broadcasted_iota(
        jnp.int32, (sqp_cfg.num_alphas, 1), 0
    )
    alf8 = jnp.zeros((sqp_cfg.num_alphas, 1), dtype)
    for i, a in enumerate(alphas):
        alf8 = jnp.where(cand_id == i, a, alf8)

    # Working trajectory lives in the output refs.
    Xo_ref[...] = X_ref[...]
    Xo_ref[0] = xs_ref[...]
    Uo_ref[...] = U_ref[...]
    rho = rho_ref[0]
    w = w_ref[...] if use_wrench else None

    done = jnp.zeros((T,), jnp.bool_)

    for it in range(sqp_cfg.max_iters):
        # ---- Stage 1: linearize + cost data, all knots folded ----
        # The knot axis is data-parallel, so the whole horizon linearizes
        # in one (12, N-1, T) elementwise pass (one RNEA primal + one
        # 12-tangent JVP for every knot at once).  Also accumulates the
        # alpha=0 merit as a byproduct: the base defect is exactly d_scr,
        # the base cost reuses the FK already evaluated for the GN blocks.
        Xf0 = Xo_ref[...]                       # (N, 12, T)
        xk1 = jnp.swapaxes(Xf0[:Nm1], 0, 1)     # (12, Nm1, T)
        uk1 = jnp.swapaxes(Uo_ref[...], 0, 1)   # (6, Nm1, T)
        wk1 = None if w is None else w[:, None, :]
        Gf0 = goals_ref[...]
        goal1 = [Gf0[:Nm1, i] for i in range(3)]
        da, minv, xnext, qvec, scale2, Jrows, bc_k = _linearize_knot(
            sm, cost_cfg, dt, xk1, uk1, wk1, goal1
        )
        # Stored PRESCALED by dt: downstream only ever uses dt*da
        # (A bottom rows) and dt*M^-1 (B bottom rows).
        da_scr[...] = dt * jnp.swapaxes(jnp.concatenate(da), 0, 1)
        minv_scr[...] = dt * jnp.swapaxes(
            jnp.stack([minv[i][j] for i in range(NU) for j in range(NU)]),
            0, 1,
        )
        d = xnext - jnp.swapaxes(Xf0[1:], 0, 1)  # (12, Nm1, T)
        d_scr[...] = jnp.swapaxes(d, 0, 1)
        qv_scr[0:Nm1] = jnp.swapaxes(qvec, 0, 1)
        sc_scr[0:Nm1] = jnp.swapaxes(scale2, 0, 1)
        J_scr[0:Nm1] = jnp.swapaxes(Jrows, 0, 1)
        dq2 = sum(d[i] * d[i] for i in range(NQ))
        dv2 = sum(d[NQ + i] * d[NQ + i] for i in range(NQ))
        base_cost = jnp.sum(bc_k, axis=0)
        base_cv = jnp.sum(
            LR.fast_sqrt(dq2) + LR.fast_sqrt(dv2), axis=0
        )
        # Terminal knot cost data.
        goal_T = [Gf0[N - 1, i] for i in range(3)]
        qvec_T, scale2_T, Jrows_T, bc_T = _cost_knot(
            sm, cost_cfg, goal_T, Xf0[N - 1]
        )
        qv_scr[N - 1] = qvec_T
        sc_scr[N - 1] = scale2_T
        J_scr[N - 1] = Jrows_T
        base_merit = (base_cost + bc_T) + mu * base_cv

        if stages < 2:  # profiling cut: linearize only
            continue

        # ---- Stage 2: Riccati backward sweep (column-stacked) ----
        # All 12x12 products run as (12, T) sublane-wide FMAs over COLUMN
        # stacks (column j of M = a (12, T) array whose sublane i is
        # M[i][j]) instead of per-entry (T,) scalar chains — ~6x fewer
        # issued VPU ops for the same FLOPs.  S is stored column-major in
        # S_scr (sublane block j*12 = column j); A never materializes:
        # A = I + [0 dtI; dt*da] is applied through its structure.
        # S MUST be re-symmetrized every step: the backward recursion
        # amplifies the asymmetric f32 noise of A^T S A by ~||A||^2 per
        # knot, which at N=64 on stiff warm-started problems grows from
        # roundoff to O(||S||) and destabilizes the closed loop
        # (observed: torque blow-up -> NaN after ~300 ticks).  The Qxu K
        # term is therefore computed in the bit-symmetric LDL form
        # -Y^T D^-1 Y, and the A^T S A + Q part gets an explicit
        # 0.5 (M + M^T) through a (12, 12, T) sublane transpose.
        QN = cost_cfg.QN
        row12 = jax.lax.broadcasted_iota(jnp.int32, (NX, T), 0)
        zeros6T = jnp.zeros((NQ, T), dtype)

        def _vshift6(col):
            """out[i] = col[i-6] for i >= 6 else 0 (the dt I block of A^T)."""
            return jnp.concatenate([zeros6T, col[:NQ]])

        row6 = jax.lax.broadcasted_iota(jnp.int32, (NQ, T), 0)

        def _q_cols(Jr, twodQ, qmod_static, hb=None):
            """GN cost Hessian as 12 column stacks from J rows (18, T);
            ``hb`` (6, T) adds the joint-range barrier diagonal (scaled by
            ``qmod_static``, like the J^T J part) to the position block."""
            Jst = [Jr[a * NQ : (a + 1) * NQ] for a in range(3)]  # (6, T)
            cols = []
            for j in range(NQ):
                qtop = _csum(
                    Jst[a] * (2.0 * qmod_static * Jr[a * NQ + j])[None, :]
                    for a in range(3)
                )
                if hb is not None:
                    qtop = qtop + jnp.where(
                        row6 == j, (qmod_static * hb[j])[None, :], 0.0
                    ).astype(dtype)
                cols.append(jnp.concatenate([qtop, zeros6T]))
            for j in range(NQ, NX):
                cols.append(
                    jnp.where(row12 == j, twodQ[None, :], 0.0).astype(dtype)
                )
            return cols

        use_b = bool(cost_cfg.q_barrier)

        def _hb_of(k):
            return (
                [sc_scr[k, 2 + i] for i in range(NQ)] if use_b else None
            )

        # Terminal boundary: S = Q_N (columns), s = [QN q_pos; q_vel].
        S0_cols = _q_cols(J_scr[N - 1], sc_scr[N - 1, 0], QN, _hb_of(N - 1))
        qvT = qv_scr[N - 1]
        s0 = jnp.concatenate([QN * qvT[:NQ], qvT[NQ:]])
        S_scr[...] = jnp.concatenate(S0_cols + [s0])

        def bwd_body(kk, _):
            k = Nm1 - 1 - kk
            Sf = S_scr[...]
            S_col = [Sf[j * NX : (j + 1) * NX] for j in range(NX)]
            s_col = Sf[NX * NX : NX * NX + NX]
            dtda = da_scr[k]    # (72, T): row u*12+j = dt * da[u][j]
            Wmv = minv_scr[k]   # (36, T): row u*6+j = dt * Minv[u][j]
            dvec = d_scr[k]
            qv = qv_scr[k]
            twodQ = sc_scr[k, 0]
            twoR = sc_scr[k, 1]
            Prow = [dtda[u * NX : (u + 1) * NX] for u in range(NQ)]

            def At_apply(col):
                """(A^T M) column from an (12, T) M column."""
                out = col + dt * _vshift6(col)
                for t in range(NQ):
                    out = out + Prow[t] * col[NQ + t][None, :]
                return out

            # SA = S A, column by column (A's structure folded in).
            SA = []
            for j in range(NX):
                c = S_col[j] if j < NQ else S_col[j] + dt * S_col[j - NQ]
                for u in range(NQ):
                    c = c + S_col[NQ + u] * dtda[u * NX + j][None, :]
                SA.append(c)
            # Qxx = A^T S A + Q.
            Qcols = _q_cols(J_scr[k], twodQ, 1.0, _hb_of(k))
            Qxx = [At_apply(SA[j]) + Qcols[j] for j in range(NX)]

            # SB = S B (B = [0; dt M^-1]) and Qxu = A^T S B.
            SB = []
            for j in range(NU):
                c = _csum(
                    S_col[NQ + u] * Wmv[u * NU + j][None, :]
                    for u in range(NQ)
                )
                SB.append(c)
            Qxu = [At_apply(SB[j]) for j in range(NU)]

            # Quu = B^T S B + (2R + rho) I — scalar entries for the LDL^T.
            # Lower triangle only (that is all chol6 reads).
            Quu = [[None] * NU for _ in range(NU)]
            for i in range(NU):
                for j in range(i + 1):
                    v = _csum(
                        Wmv[t * NU + i] * SB[j][NQ + t] for t in range(NQ)
                    )
                    Quu[i][j] = v + (twoR + rho if i == j else 0.0)
                    Quu[j][i] = Quu[i][j]
            fac = LR.chol6(Quu)
            Lc, _, invD = fac

            # K = -Quu^-1 Qxu^T: ONE substitution pass with the 12 state
            # dims stacked in sublanes (rhs component t = Qxu column t).
            y6 = [None] * NU
            for i in range(NU):
                s_ = Qxu[i]
                for k2 in range(i):
                    s_ = s_ - Lc[i][k2][None, :] * y6[k2]
                y6[i] = s_
            Kst = [None] * NU
            for i in range(NU - 1, -1, -1):
                s_ = y6[i] * invD[i][None, :]
                for k2 in range(i + 1, NU):
                    s_ = s_ + Lc[k2][i][None, :] * Kst[k2]
                Kst[i] = -s_
            # Kst[t] sublane j = K[t][j]; K_scr row t*12+j = K[t][j]
            # (same layout the forward rollout reads).
            K_scr[k] = jnp.concatenate(Kst)

            # Sc = S d + s; qx = A^T Sc + qv; qu = B^T Sc + 2R u.
            Sc = _csum(
                S_col[t] * dvec[t][None, :] for t in range(NX)
            ) + s_col
            qx = At_apply(Sc) + qv
            qu = [
                _csum(Wmv[u * NU + t] * Sc[NQ + u] for u in range(NQ))
                + twoR * Uo_ref[k, t]
                for t in range(NU)
            ]
            kff_l = LR.chol6_solve(fac, qu)
            kff = [-kff_l[i] for i in range(NU)]
            kff_scr[k] = _stackT(kff, T, dtype)

            # S_new = sym(Qxx + Qxu K); s_new = qx + Qxu kff.  The explicit
            # 0.5 (M + M^T) is what keeps the recursion stable (see the
            # stage comment); the transpose is one (12, 12, T) sublane
            # relayout per knot.
            S_new = [
                Qxx[j]
                + _csum(Qxu[t] * Kst[t][j][None, :] for t in range(NU))
                for j in range(NX)
            ]
            s_new = qx + _csum(
                Qxu[t] * kff[t][None, :] for t in range(NU)
            )
            Sn = jnp.concatenate(S_new)  # (144, T)
            SnT = jnp.swapaxes(
                Sn.reshape(NX, NX, T), 0, 1
            ).reshape(NX * NX, T)
            Ssym = 0.5 * (Sn + SnT)
            S_scr[...] = jnp.concatenate([Ssym, s_new])
            return 0

        jax.lax.fori_loop(0, Nm1, bwd_body, 0)

        if stages < 3:  # profiling cut: linearize + backward sweep
            continue

        # ---- Stage 3: forward rollout of the delta policy ----
        dX_scr[0] = jnp.zeros((NX, T), dtype)  # x0 pinned => dx0 = 0

        def fwd_body(k, _):
            dx = _rows(dX_scr[k], NX)
            Kf = _rows(K_scr[k], 72)
            Kl = [[Kf[i * NX + j] for j in range(NX)] for i in range(NU)]
            du = _matvec(Kl, dx, NU, NX)
            du = [du[i] + kff_scr[k, i] for i in range(NU)]
            A = _A_from_dtda(_rows(da_scr[k], 72), dt)
            B = _B_from_dtminv(_rows(minv_scr[k], 36))
            dxn = _matvec(A, dx, NX, NX)
            Bu = _matvec(B, du, NX, NU)
            d = d_scr[k]
            dU_scr[k] = _stackT(du, T, dtype)
            dX_scr[k + 1] = _stackT(
                [dxn[i] + Bu[i] for i in range(NX)], T, dtype
            ) + d
            return 0

        jax.lax.fori_loop(0, Nm1, fwd_body, 0)

        if stages < 4:  # profiling cut: no line search / update
            continue

        # ---- Stage 4: folded 8-candidate merit line search ----
        # (the alpha=0 base merit was accumulated in stage 1.)  Knots stay
        # a sequential fori_loop here: the fully (alphas x knots)-folded
        # variant measured ~2x SLOWER (111 vs 57 us) — the swapaxes
        # relayouts into (8, N-1, T) candidate tensors cost more than the
        # wider ops save.
        def merit_knot_cost(xc, goal, qmod):
            # xc: (num_alphas, ...) candidate fold per component list
            q = xc[:NQ]
            v = xc[NQ:]
            eep = LR.ee_pos(sm, q)
            err2 = sum((eep[i] - goal[i]) ** 2 for i in range(3))
            v2 = sum(v[i] * v[i] for i in range(NQ))
            pos = err2
            if cost_cfg.q_barrier:
                pos = pos + _barrier_knot(sm, cost_cfg, q)[0]
            return qmod * pos + cost_cfg.dQ * v2

        def ls_body(k, acc):
            cost_acc, cv_acc = acc
            x = Xo_ref[k]
            xn = Xo_ref[k + 1]
            u = Uo_ref[k]
            dx = dX_scr[k]
            dxn = dX_scr[k + 1]
            du = dU_scr[k]
            xc = [x[i][None, :] + alf8 * dx[i][None, :] for i in range(NX)]
            xnc = [xn[i][None, :] + alf8 * dxn[i][None, :] for i in range(NX)]
            uc = [u[i][None, :] + alf8 * du[i][None, :] for i in range(NU)]
            goal = [goals_ref[k, i][None, :] for i in range(3)]
            cost_k = merit_knot_cost(xc, goal, 1.0)
            cost_k = cost_k + cost_cfg.R * sum(
                uc[i] * uc[i] for i in range(NU)
            )
            # Euler defect under the lane wrench.
            q = xc[:NQ]
            v = xc[NQ:]
            fe = None
            if w is not None:
                wb = [w[i][None, :] for i in range(6)]
                fe = LR.world_wrench_to_ee(sm, q, wb)
            a, _ = LR.forward_dynamics(sm, q, v, uc, f_ext_ee=fe)
            dq2 = sum(
                (q[i] + dt * v[i] - xnc[i]) ** 2 for i in range(NQ)
            )
            dv2 = sum(
                (v[i] + dt * a[i] - xnc[NQ + i]) ** 2 for i in range(NQ)
            )
            cv_k = LR.fast_sqrt(dq2) + LR.fast_sqrt(dv2)
            return (cost_acc + cost_k, cv_acc + cv_k)

        zero8 = jnp.zeros((sqp_cfg.num_alphas, T), dtype)
        cost_acc, cv_acc = jax.lax.fori_loop(
            0, Nm1, ls_body, (zero8, zero8)
        )
        # Terminal knot cost (QN) + initial-state deviation (alpha dx0 = 0).
        xT = Xo_ref[N - 1]
        dxT = dX_scr[N - 1]
        xTc = [xT[i][None, :] + alf8 * dxT[i][None, :] for i in range(NX)]
        goal_T8 = [goals_ref[N - 1, i][None, :] for i in range(3)]
        cost_acc = cost_acc + merit_knot_cost(xTc, goal_T8, cost_cfg.QN)
        merits = cost_acc + mu * cv_acc  # (num_alphas, T)

        base = base_merit
        alpha = jnp.zeros((T,), dtype)
        for i in range(sqp_cfg.num_alphas - 1, -1, -1):
            alpha = jnp.where(merits[i] <= base, alphas[i], alpha)

        take = jnp.logical_and(~done, alpha > 0.0)
        scale = jnp.where(take, alpha, 0.0)

        # Step norm over the full delta; masked whole-array update.
        dXf = dX_scr[...]
        dUf = dU_scr[...]
        nrm2 = jnp.sum(dXf * dXf, axis=(0, 1)) + jnp.sum(
            dUf * dUf, axis=(0, 1)
        )
        step_norm = scale * LR.fast_sqrt(nrm2)

        Xo_ref[...] = Xo_ref[...] + scale[None, None, :] * dXf
        Uo_ref[...] = Uo_ref[...] + scale[None, None, :] * dUf

        alpha_ref[it] = jnp.where(done, 0.0, alpha)
        step_ref[it] = step_norm

        rejected = jnp.logical_and(~done, alpha <= 0.0)
        rho = jnp.clip(
            jnp.where(rejected, rho * sqp_cfg.rho_factor, rho),
            sqp_cfg.rho,
            sqp_cfg.rho_max,
        )
        done = jnp.logical_or(
            done, jnp.logical_and(take, step_norm < sqp_cfg.step_tol)
        )

    rhoo_ref[0] = rho


def sqp_solve_pallas(
    model: RobotModel,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    dt: float,
    xs_b,
    goals_b,
    X_b,
    U_b,
    wrench_b=None,
    rho_b=None,
    tile: int = 128,
    interpret: bool = False,
    stages: int = 4,
):
    """Batched SQP solve, lane-major pallas path.

    Args (lane-major): xs_b (12, B), goals_b (N, 3, B), X_b (N, 12, B),
    U_b (N-1, 6, B), wrench_b (6, B) or None, rho_b (B,) or None.
    B must be a multiple of ``tile`` (pad lanes to 128 for full vreg use).

    Returns (X (N, 12, B), U (N-1, 6, B), rho (B,), alphas (iters, B),
    steps (iters, B)).

    ``stages`` truncates each SQP iteration after stage 1 (linearize),
    2 (+Riccati backward), or 3 (+forward rollout) — a profiling aid for
    attributing kernel time (outputs are then meaningless); 4 = full solve.
    """
    sm = LR.static_model(model)
    B = xs_b.shape[-1]
    N = X_b.shape[0]
    dtype = jnp.float32
    if B % tile:
        raise ValueError(f"B={B} not a multiple of tile={tile}")
    use_wrench = wrench_b is not None
    if wrench_b is None:
        wrench_b = jnp.zeros((6, B), dtype)
    if rho_b is None:
        rho_b = jnp.full((B,), sqp_cfg.rho, dtype)
    rho_b = rho_b.reshape(1, B)

    kernel = functools.partial(
        _sqp_kernel, sm, cost_cfg, sqp_cfg, dt, N, use_wrench, stages
    )
    Nm1 = N - 1
    it = sqp_cfg.max_iters

    def spec(*shape):
        nd = len(shape)
        return pl.BlockSpec(
            shape + (tile,),
            (lambda i, _nd=nd: (0,) * _nd + (i,)),
            memory_space=pltpu.VMEM,
        )

    out = pl.pallas_call(
        kernel,
        grid=(B // tile,),
        # The knot-folded stages hold (12, N-1, tile) temporaries; the
        # default 16 MiB scoped-VMEM cap overflows at N=32/tile=64.
        # v5e has 128 MiB of physical VMEM; give the kernel headroom.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        in_specs=[
            spec(12), spec(N, 3), spec(N, 12), spec(Nm1, 6), spec(6), spec(1),
        ],
        out_specs=(
            spec(N, 12), spec(Nm1, 6), spec(1), spec(it), spec(it),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N, 12, B), dtype),
            jax.ShapeDtypeStruct((Nm1, 6, B), dtype),
            jax.ShapeDtypeStruct((1, B), dtype),
            jax.ShapeDtypeStruct((it, B), dtype),
            jax.ShapeDtypeStruct((it, B), dtype),
        ),
        scratch_shapes=[
            pltpu.VMEM((Nm1, 72, tile), dtype),   # da
            pltpu.VMEM((Nm1, 36, tile), dtype),   # minv
            pltpu.VMEM((Nm1, 12, tile), dtype),   # defects
            pltpu.VMEM((N, 12, tile), dtype),     # qvec
            pltpu.VMEM((N, 8, tile), dtype),      # scales + barrier diag
            pltpu.VMEM((N, 18, tile), dtype),     # J rows
            pltpu.VMEM((Nm1, 72, tile), dtype),   # K
            pltpu.VMEM((Nm1, 6, tile), dtype),    # kff
            pltpu.VMEM((N, 12, tile), dtype),     # dX
            pltpu.VMEM((Nm1, 6, tile), dtype),    # dU
            pltpu.VMEM((156, tile), dtype),       # S (144) + s (12)
        ],
        interpret=interpret,
    )(xs_b, goals_b, X_b, U_b, wrench_b, rho_b)
    X, U, rho, alphas, steps = out
    return X, U, rho[0], alphas, steps
