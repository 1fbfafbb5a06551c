"""Lane-major batched SQP solver — the fused kernel's READABLE TWIN.

This is the same lane-major structure-of-arrays algorithm that
ops/pallas/sqp_kernel.py fuses into one TPU kernel, expressed as ordinary
traceable JAX on the shared engine (ops/lane_rbd.py / ops/lane_sqp.py).
It exists to keep the kernel debuggable and testable anywhere: it runs on
CPU (no Mosaic), it is differentiable/inspectable op by op, and
tests/test_lane_sqp.py pins its numerics against the readable vmap
solver — so kernel bugs bisect to either "the shared lane-major math"
(reproducible here) or "the pallas packaging" (kernel-only).

Production dispatch never selects this module (solvers/select.py picks
sqp_pallas on TPU, solvers/sqp elsewhere); it is a test/debug artifact
with the same API as both.  Same semantics: fixed iteration count with
per-lane masked updates, 8-alpha merit line search (osqp_sqp.py:49-93),
per-lane Levenberg rho state (the reference's resetRho analog,
gato_controller.py:131-138).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..config import CostConfig, SQPConfig
from ..models.robot import RobotModel
from ..ops import lane_rbd as LR
from ..ops import lane_sqp as LS
from .sqp import SolverState, SQPResult, SQPStats


def batch_solve(
    model: RobotModel,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    dt: float,
    xs_b,
    goals_b,
    X_b,
    U_b,
    state: Optional[SolverState] = None,
    wrench_world_batch=None,
) -> SQPResult:
    """Lane-batched SQP solve; array API identical to sqp.batch_solve.

    xs_b: (B, 12), goals_b: (B, N, 3), X_b: (B, N, 12), U_b: (B, N-1, 6),
    wrench_world_batch: (B, 6) or None.
    """
    if cost_cfg.formulation != "gn":
        raise ValueError("lane solver implements the 'gn' formulation only")
    sm = LR.static_model(model)
    B = xs_b.shape[0]
    dtype = X_b.dtype
    if state is None:
        state = SolverState.init(sqp_cfg, (B,))
    rho = state.rho.astype(dtype)

    # To lane-major layout.
    X = jnp.transpose(X_b, (1, 2, 0))      # (N, 12, B)
    U = jnp.transpose(U_b, (1, 2, 0))      # (N-1, 6, B)
    goals = jnp.transpose(goals_b, (1, 2, 0))  # (N, 3, B)
    xs = xs_b.T                            # (12, B)
    w = None
    if wrench_world_batch is not None:
        w = wrench_world_batch.T           # (6, B)

    X = X.at[0].set(xs)
    alphas = 0.5 ** jnp.arange(sqp_cfg.num_alphas, dtype=dtype)
    mu = sqp_cfg.merit_mu

    done = jnp.zeros(B, bool)
    iters = jnp.zeros(B, jnp.int32)
    step_log = jnp.zeros((sqp_cfg.max_iters, B), dtype)
    alpha_log = jnp.zeros((sqp_cfg.max_iters, B), dtype)

    for it in range(sqp_cfg.max_iters):
        blocks = LS.build_blocks(sm, cost_cfg, X, U, goals, dt, wrench=w)
        dX, dU = LS.riccati(blocks, jnp.zeros_like(xs), rho)

        # Candidates: the 8 alphas plus alpha=0 (the base merit).
        alf = jnp.concatenate([alphas, jnp.zeros(1, dtype)])
        Xc = X[None] + alf[:, None, None, None] * dX[None]
        Uc = U[None] + alf[:, None, None, None] * dU[None]
        merits = LS.merit_batch(
            sm, cost_cfg, mu, Xc, Uc, goals, X[0], dt, wrench=w
        )  # (9, B)
        base = merits[-1]
        ok = merits[:-1] <= base[None]
        any_ok = jnp.any(ok, axis=0)
        first = jnp.argmax(ok, axis=0)
        alpha = jnp.where(any_ok, alphas[first], 0.0)  # (B,)

        take = jnp.logical_and(~done, alpha > 0.0)
        scale = jnp.where(take, alpha, 0.0)
        X = X + scale * dX
        U = U + scale * dU

        norm = jnp.sqrt(
            jnp.sum(dX * dX, axis=(0, 1)) + jnp.sum(dU * dU, axis=(0, 1))
        )
        step_norm = scale * norm
        step_log = step_log.at[it].set(step_norm)
        alpha_log = alpha_log.at[it].set(jnp.where(done, 0.0, alpha))
        iters = iters + jnp.where(done, 0, 1).astype(jnp.int32)

        rejected = jnp.logical_and(~done, ~any_ok)
        rho = jnp.clip(
            jnp.where(rejected, rho * sqp_cfg.rho_factor, rho),
            sqp_cfg.rho,
            sqp_cfg.rho_max,
        )
        done = jnp.logical_or(
            done, jnp.logical_and(take, step_norm < sqp_cfg.step_tol)
        )

    return SQPResult(
        X=jnp.transpose(X, (2, 0, 1)),
        U=jnp.transpose(U, (2, 0, 1)),
        state=SolverState(rho=rho.astype(state.rho.dtype)),
        stats=SQPStats(
            iterations=iters,
            step_sizes=step_log.T,
            alphas=alpha_log.T,
        ),
    )
