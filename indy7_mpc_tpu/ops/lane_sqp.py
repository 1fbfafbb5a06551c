"""Lane-major batched SQP internals: linearize, cost blocks, Riccati, merit.

Companion to lane_rbd.py: the full SQP iteration in structure-of-arrays
layout with the lane batch riding the minormost axis.  Produces results
numerically identical to ops/kkt.py + ops/riccati.py + solvers/sqp.py in
the Gauss-Newton formulation (enforced by tests/test_lane_sqp.py); those
remain the readable oracle implementations.

Array conventions (lane-major):
  X: (N, 12, B), U: (N-1, 6, B), goals: (N, 3, B), xs: (12, B),
  wrench: (6, B) or None.
Riccati blocks: A (N-1, 12, 12, B), Bm (N-1, 12, 6, B), d (N-1, 12, B),
  Q (N, 12, 12, B), q (N, 12, B), R scalar-diag (N-1, B), r (N-1, 6, B).

Key tricks:
  * dynamics derivatives: 12 tangent passes through ``jax.linearize`` of
    the lane-major forward dynamics, batched with one vmap (the tangent
    axis folds into the elementwise lanes);
  * da/du = M^-1 recovered from the already-factored mass matrix — no
    extra tangent passes for control columns;
  * Riccati scan carries S as a nested tuple of (B,) arrays; every matmul
    is unrolled into (B,)-elementwise FMAs (no batched-small-matmul
    lowering, no jnp.linalg);
  * the 8-alpha merit line search folds (alpha, knot) into the lane axis:
    one fused dynamics pass evaluates all candidates
    (osqp_sqp.py:49-74 semantics, mu = 10).
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from ..config import CostConfig, SQPConfig
from . import lane_rbd as LR

NX, NQ, NU = 12, 6, 6


# ---------------------------------------------------------------------------
# Linearization (Euler step Jacobians) and GN cost blocks.
# ---------------------------------------------------------------------------

def linearize(sm: LR.StaticModel, x, u, dt: float, wrench=None):
    """Euler-step Jacobians on folded knots: x (12, L), u (6, L).

    Returns (A (12, 12, L), Bm (12, 6, L), xnext (12, L)).

    Derivatives use the RNEA-transpose identity instead of differentiating
    through the mass-matrix solve:  along the solution,
    ``tau = RNEA(q, v, a; f_ext(q))``, so
    ``da/d(q,v) = -M^-1 * d RNEA(q, v, a*; f_ext(q)) / d(q,v)`` with
    ``a*`` held fixed, and ``da/du = M^-1`` from the already-factored
    Cholesky.  The 12 tangent directions fold into the lane axis through
    ONE ``jax.jvp`` of the (solve-free) RNEA — jvp through the unrolled
    Cholesky produced modules XLA took minutes to compile.
    """
    L = x.shape[-1]
    dtype = x.dtype

    # Primal solve: a* and the Cholesky factor of M.
    q0, v0 = LR._split(x)
    fe0 = LR._f_ext_from_world(sm, q0, wrench)
    a0_l, Lc = LR.forward_dynamics(
        sm, q0, v0, [u[i] for i in range(NU)], fe0
    )
    a0 = jnp.stack(a0_l)

    # Tangent pass: d RNEA(q, v, a*; f_ext(q)) in 12 folded directions.
    xt = jnp.tile(x, (1, NX))          # (12, 12 L)
    at = jnp.tile(a0, (1, NX))
    wt = jnp.tile(wrench, (1, NX)) if wrench is not None else None

    def rnea_of_x(x_):
        q_, v_ = LR._split(x_)
        fe_ = LR._f_ext_from_world(sm, q_, wt)
        tau = LR.rnea(
            sm, q_, v_, [at[i] for i in range(NU)], f_ext_ee=fe_
        )
        return jnp.stack(tau)

    tangent = jnp.kron(jnp.eye(NX, dtype=dtype), jnp.ones((1, L), dtype))
    _, dtau = jax.jvp(rnea_of_x, (xt,), (tangent,))  # (6, 12 L)

    # da/dx columns: -M^-1 dtau_j ; da/du columns: M^-1 e_j.
    da_cols = []
    for j in range(NX):
        col = [dtau[i, j * L : (j + 1) * L] for i in range(NU)]
        sol = LR.chol6_solve(Lc, col)
        da_cols.append(tuple(-sol[i] for i in range(NU)))
    da_dx = jnp.stack(
        [jnp.stack(list(c)) for c in da_cols]
    )  # (12 tangents, 6, L)

    eye_cols = []
    for j in range(NU):
        e = [jnp.full((L,), 1.0 if i == j else 0.0, dtype) for i in range(NU)]
        eye_cols.append(LR.chol6_solve(Lc, e))  # column j of M^-1

    # Assemble A = [[I, dt I], [dt da/dq, I + dt da/dv]].
    A = jnp.zeros((NX, NX, L), dtype)
    idx = jnp.arange(NQ)
    A = A.at[idx, idx].set(1.0)
    A = A.at[idx, idx + NQ].set(dt)
    # bottom rows i+6, columns j: dt * da_i/dx_j  (+ I on velocity diag)
    bottom = dt * jnp.swapaxes(da_dx, 0, 1)  # (6 accel, 12 tangent, L)
    A = A.at[NQ:, :].set(bottom)
    A = A.at[idx + NQ, idx + NQ].add(1.0)

    Bm = jnp.zeros((NX, NU, L), dtype)
    minv = jnp.stack(
        [jnp.stack(col) for col in eye_cols], axis=1
    )  # (i, j, L) = M^-1[i, j]
    Bm = Bm.at[NQ:, :].set(dt * minv)

    q, v = LR._split(x)
    xnext = jnp.concatenate(
        [
            jnp.stack([q[i] + dt * v[i] for i in range(NQ)]),
            jnp.stack([v[i] + dt * a0[i] for i in range(NQ)]),
        ]
    )
    return A, Bm, xnext


class LaneBlocks(NamedTuple):
    A: jnp.ndarray   # (N-1, 12, 12, B)
    Bm: jnp.ndarray  # (N-1, 12, 6, B)
    d: jnp.ndarray   # (N-1, 12, B) defects
    Q: jnp.ndarray   # (N, 12, 12, B)
    q: jnp.ndarray   # (N, 12, B)
    Rdiag: jnp.ndarray  # (N-1, B) control weight (scalar diagonal)
    r: jnp.ndarray   # (N-1, 6, B)


def cost_scale(cfg: CostConfig, err_norm):
    if cfg.regularize:
        return 1.0 / (err_norm + cfg.eps)
    return jnp.ones_like(err_norm)


def build_blocks(
    sm: LR.StaticModel,
    cfg: CostConfig,
    X,
    U,
    goals,
    dt: float,
    wrench=None,
) -> LaneBlocks:
    """GN delta-variable QP blocks, lane-major (see kkt.build_qp_gn)."""
    N = X.shape[0]
    B = X.shape[-1]
    dtype = X.dtype

    # --- dynamics: fold knots into lanes -------------------------------
    Lfold = (N - 1) * B
    xf = jnp.reshape(X[:-1].swapaxes(0, 1), (NX, Lfold))
    uf = jnp.reshape(U.swapaxes(0, 1), (NU, Lfold))
    wf = None
    if wrench is not None:
        wf = jnp.reshape(
            jnp.broadcast_to(wrench[None], (N - 1, 6, B)).swapaxes(0, 1),
            (6, Lfold),
        )
    Af, Bf, xnextf = linearize(sm, xf, uf, dt, wrench=wf)
    A = jnp.reshape(Af, (NX, NX, N - 1, B)).transpose(2, 0, 1, 3)
    Bm = jnp.reshape(Bf, (NX, NU, N - 1, B)).transpose(2, 0, 1, 3)
    xnext = jnp.reshape(xnextf, (NX, N - 1, B)).swapaxes(0, 1)
    d = xnext - X[1:]

    # --- cost: fold all N knots ----------------------------------------
    Lc = N * B
    qf = [jnp.reshape(X[:, i].reshape(N * B), (Lc,)) for i in range(NQ)]
    eep, cols = LR.ee_pos_jacobian(sm, qf)
    gf = jnp.reshape(goals.swapaxes(0, 1), (3, Lc))
    err = [eep[i] - gf[i] for i in range(3)]
    err_norm = jnp.sqrt(err[0] ** 2 + err[1] ** 2 + err[2] ** 2)
    scale = cost_scale(cfg, err_norm)
    dQ_mod = cfg.dQ * scale
    R_mod = cfg.R * scale
    # terminal mask over knots
    term = jnp.reshape(
        jnp.broadcast_to(
            (jnp.arange(N) == N - 1)[:, None], (N, B)
        ),
        (Lc,),
    )
    Q_mod = jnp.where(term, cfg.QN, 1.0).astype(dtype)

    # J^T J (6x6) and J^T err per knot, unrolled.
    Qblk = jnp.zeros((NX, NX, Lc), dtype)
    for i in range(NQ):
        for j in range(i, NQ):
            v = 2.0 * Q_mod * LR.dot3(cols[i], cols[j])
            Qblk = Qblk.at[i, j].set(v)
            if i != j:
                Qblk = Qblk.at[j, i].set(v)
    idx = jnp.arange(NQ)
    Qblk = Qblk.at[idx + NQ, idx + NQ].set(
        jnp.broadcast_to(2.0 * dQ_mod, (NQ, Lc))
    )
    grad = jnp.zeros((NX, Lc), dtype)
    for i in range(NQ):
        grad = grad.at[i].set(2.0 * Q_mod * LR.dot3(cols[i], err))
    vf = jnp.reshape(X[:, NQ:].swapaxes(0, 1), (NQ, Lc))
    grad = grad.at[NQ:].set(2.0 * dQ_mod * vf)

    # Joint-range barrier (kkt.barrier_terms semantics, Qmod-scaled like
    # the EE term — mirrors the fused kernel's _barrier_knot).
    if cfg.q_barrier:
        w_b = cfg.q_barrier
        for i in range(NQ):
            hi = float(sm.q_upper[i]) - cfg.q_barrier_margin
            lo = float(sm.q_lower[i]) + cfg.q_barrier_margin
            d_hi = jnp.maximum(qf[i] - hi, 0.0)
            d_lo = jnp.maximum(lo - qf[i], 0.0)
            gb = 2.0 * w_b * (d_hi - d_lo)
            hb = 2.0 * w_b * jnp.logical_or(
                d_hi > 0.0, d_lo > 0.0
            ).astype(dtype)
            Qblk = Qblk.at[i, i].add(Q_mod * hb)
            grad = grad.at[i].add(Q_mod * gb)

    Q = jnp.reshape(Qblk, (NX, NX, N, B)).transpose(2, 0, 1, 3)
    qvec = jnp.reshape(grad, (NX, N, B)).swapaxes(0, 1)
    Rknots = jnp.reshape(2.0 * R_mod, (N, B))[:-1]
    r = Rknots[:, None, :] * U

    return LaneBlocks(A=A, Bm=Bm, d=d, Q=Q, q=qvec, Rdiag=Rknots, r=r)


# ---------------------------------------------------------------------------
# Riccati sweep with unrolled lane-major linear algebra.
# ---------------------------------------------------------------------------

def _to_rows(M, n, m):
    """(n, m, B) array -> nested tuple rows of (B,) arrays."""
    return tuple(tuple(M[i, j] for j in range(m)) for i in range(n))


def _from_rows(rows):
    return jnp.stack([jnp.stack(list(r)) for r in rows])


def _cmul(a, b):
    """a * b with Python-float constant folding.

    Inside the fused kernel, A/B dynamics blocks carry literal 0.0 / 1.0 /
    dt entries (_A_from_da, _B_from_minv); Mosaic does not reliably fold
    multiplies by those constants, so fold them at trace time: 0 * x drops
    the term entirely (None), 1 * x passes x through.  Identical numerics
    (dropping a +0.0*x addend only ever flips a -0.0 result to +0.0).
    """
    if isinstance(a, (float, int)):
        if a == 0.0:
            return None
        if a == 1.0:
            return b
    if isinstance(b, (float, int)):
        if b == 0.0:
            return None
        if b == 1.0:
            return a
    return a * b


def _csum(terms):
    """Sum skipping folded-away (None) terms; 0.0 if all vanish."""
    acc = None
    for t in terms:
        if t is None:
            continue
        acc = t if acc is None else acc + t
    return 0.0 if acc is None else acc


def _matmul(Arows, Brows, n, k, m):
    """(n x k) @ (k x m) on nested tuples of (B,); entries may be floats."""
    return tuple(
        tuple(
            _csum(_cmul(Arows[i][t], Brows[t][j]) for t in range(k))
            for j in range(m)
        )
        for i in range(n)
    )


def _matTmul(Arows, Brows, n, k, m):
    """A^T (k x n -> n x k) @ B: A given as (k x n)."""
    return tuple(
        tuple(
            _csum(_cmul(Arows[t][i], Brows[t][j]) for t in range(k))
            for j in range(m)
        )
        for i in range(n)
    )


def _matvec(Arows, v, n, k):
    return tuple(
        _csum(_cmul(Arows[i][t], v[t]) for t in range(k)) for i in range(n)
    )


def _matTvec(Arows, v, n, k):
    return tuple(
        _csum(_cmul(Arows[t][i], v[t]) for t in range(k)) for i in range(n)
    )


def riccati(blocks: LaneBlocks, xs_delta, rho):
    """Exact block-tridiagonal solve; see ops/riccati.py for the math.

    xs_delta: (12, B) pinned initial delta state; rho: (B,) Levenberg term.
    Returns (dX (N, 12, B), dU (N-1, 6, B)).
    """
    Nm1 = blocks.A.shape[0]

    def backward(carry, inp):
        S, s = carry  # S: 12x12 nested, s: 12 tuple
        A, Bm, d, Q, qv, Rd, r = inp
        Ar = _to_rows(A, NX, NX)
        Br = _to_rows(Bm, NX, NU)
        dv = tuple(d[i] for i in range(NX))
        Qr = _to_rows(Q, NX, NX)
        qvv = tuple(qv[i] for i in range(NX))
        rv = tuple(r[i] for i in range(NU))

        Sc = _matvec(S, dv, NX, NX)
        Sc = tuple(Sc[i] + s[i] for i in range(NX))
        SA = _matmul(S, Ar, NX, NX, NX)
        SB = _matmul(S, Br, NX, NX, NU)
        Qxx = _matTmul(Ar, SA, NX, NX, NX)
        Qxx = tuple(
            tuple(Qxx[i][j] + Qr[i][j] for j in range(NX)) for i in range(NX)
        )
        Quu = _matTmul(Br, SB, NU, NX, NU)
        Quu = tuple(
            tuple(
                Quu[i][j] + (Rd + rho if i == j else 0.0)
                for j in range(NU)
            )
            for i in range(NU)
        )
        Qxu = _matTmul(Ar, SB, NX, NX, NU)
        qx = _matTvec(Ar, Sc, NX, NX)
        qx = tuple(qx[i] + qvv[i] for i in range(NX))
        qu = _matTvec(Br, Sc, NU, NX)
        qu = tuple(qu[i] + rv[i] for i in range(NU))

        Lc = LR.chol6([list(row) for row in Quu])
        # K = -Quu^-1 Qxu^T  (columns indexed by state dim)
        Kcols = []
        for j in range(NX):
            col = [Qxu[j][i] for i in range(NU)]
            sol = LR.chol6_solve(Lc, col)
            Kcols.append(tuple(-sol[i] for i in range(NU)))
        K = tuple(tuple(Kcols[j][i] for j in range(NX)) for i in range(NU))
        kff_l = LR.chol6_solve(Lc, list(qu))
        kff = tuple(-kff_l[i] for i in range(NU))

        # S_new = Qxx + Qxu K (symmetrized), s_new = qx + Qxu kff
        QxuK = _matmul(Qxu, K, NX, NU, NX)
        S_new = tuple(
            tuple(
                0.5 * (Qxx[i][j] + QxuK[i][j] + Qxx[j][i] + QxuK[j][i])
                for j in range(NX)
            )
            for i in range(NX)
        )
        s_new = tuple(
            qx[i] + sum(Qxu[i][t] * kff[t] for t in range(NU))
            for i in range(NX)
        )
        return (S_new, s_new), (_from_rows(K), jnp.stack(list(kff)))

    S0 = _to_rows(blocks.Q[-1], NX, NX)
    s0 = tuple(blocks.q[-1][i] for i in range(NX))
    (_, _), (K, kff) = jax.lax.scan(
        backward,
        (S0, s0),
        (
            blocks.A, blocks.Bm, blocks.d,
            blocks.Q[:-1], blocks.q[:-1], blocks.Rdiag, blocks.r,
        ),
        reverse=True,
    )

    def forward(x, inp):
        A, Bm, d, Kk, kk = inp
        xr = tuple(x[i] for i in range(NX))
        Kr = _to_rows(Kk, NU, NX)
        u = _matvec(Kr, xr, NU, NX)
        u = tuple(u[i] + kk[i] for i in range(NU))
        Ar = _to_rows(A, NX, NX)
        Br = _to_rows(Bm, NX, NU)
        xn = _matvec(Ar, xr, NX, NX)
        Bu = _matvec(Br, u, NX, NU)
        x_next = jnp.stack([xn[i] + Bu[i] + d[i] for i in range(NX)])
        return x_next, (x, jnp.stack(list(u)))

    x_last, (dX, dU) = jax.lax.scan(
        forward, xs_delta, (blocks.A, blocks.Bm, blocks.d, K, kff)
    )
    dX = jnp.concatenate([dX, x_last[None]], axis=0)
    return dX, dU


# ---------------------------------------------------------------------------
# Merit (nonlinear cost + constraint violation), folded over candidates.
# ---------------------------------------------------------------------------

def merit_batch(
    sm: LR.StaticModel,
    cfg: CostConfig,
    mu: float,
    Xc,
    Uc,
    goals,
    x0_prev,
    dt: float,
    wrench=None,
):
    """Merit for a stack of candidates: Xc (C, N, 12, B) -> (C, B).

    Matches solvers/sqp.py merit(): eepos_cost + mu * (integrator defect
    + initial-state deviation), osqp_sqp.py:49-66.
    """
    C, N = Xc.shape[0], Xc.shape[1]
    B = Xc.shape[-1]

    # tracking + velocity cost over all candidate knots
    Lc = C * N * B
    qf = [Xc[:, :, i].reshape(Lc) for i in range(NQ)]
    eep = LR.ee_pos(sm, qf)
    gf = jnp.broadcast_to(goals[None], (C, N, 3, B))
    gt = [gf[:, :, i].reshape(Lc) for i in range(3)]
    err2 = sum((eep[i] - gt[i]) ** 2 for i in range(3))
    term = jnp.broadcast_to(
        (jnp.arange(N) == N - 1)[None, :, None], (C, N, B)
    ).reshape(Lc)
    Q_mod = jnp.where(term, cfg.QN, 1.0)
    v2 = sum(Xc[:, :, NQ + i].reshape(Lc) ** 2 for i in range(NQ))
    pos2 = err2
    if cfg.q_barrier:  # joint-range barrier (kkt.barrier_terms)
        w_b = cfg.q_barrier
        for i in range(NQ):
            hi = float(sm.q_upper[i]) - cfg.q_barrier_margin
            lo = float(sm.q_lower[i]) + cfg.q_barrier_margin
            d_hi = jnp.maximum(qf[i] - hi, 0.0)
            d_lo = jnp.maximum(lo - qf[i], 0.0)
            pos2 = pos2 + w_b * (d_hi * d_hi + d_lo * d_lo)
    knot_cost = Q_mod * pos2 + cfg.dQ * v2
    cost = jnp.sum(knot_cost.reshape(C, N, B), axis=1)
    cost = cost + cfg.R * jnp.sum(Uc * Uc, axis=(1, 2))

    # integrator defect (Euler), folded over (C, N-1, B)
    Ld = C * (N - 1) * B
    xf = Xc[:, :-1].transpose(2, 0, 1, 3).reshape(NX, Ld)
    uf = Uc.transpose(2, 0, 1, 3).reshape(NU, Ld)
    wf = None
    if wrench is not None:
        wf = (
            jnp.broadcast_to(wrench[None, None], (C, N - 1, 6, B))
            .transpose(2, 0, 1, 3)
            .reshape(6, Ld)
        )
    pred = LR.euler_step(sm, xf, uf, dt, wrench_world=wf)
    nxt = Xc[:, 1:].transpose(2, 0, 1, 3).reshape(NX, Ld)
    diff2 = (pred - nxt) ** 2
    dq = jnp.sqrt(jnp.sum(diff2[:NQ], axis=0) + 1e-30)
    dv = jnp.sqrt(jnp.sum(diff2[NQ:], axis=0) + 1e-30)
    defect = jnp.sum((dq + dv).reshape(C, N - 1, B), axis=1)

    dx0 = Xc[:, 0] - x0_prev[None]
    cv = defect + jnp.sqrt(jnp.sum(dx0 * dx0, axis=1) + 1e-30)
    return cost + mu * cv
