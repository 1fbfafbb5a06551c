"""Standard-API wrapper around the fused Pallas SQP kernel.

Drop-in for :func:`solvers.sqp.batch_solve` (GN formulation) with the same
array contracts; use this on TPU.  The slow path (solvers/sqp.py) remains
the readable oracle and the CPU/test path.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import CostConfig, SQPConfig
from ..models.robot import RobotModel
from ..ops.pallas import sqp_kernel
from .sqp import SolverState, SQPResult, SQPStats


def single_solve_fn(
    model: RobotModel,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    dt: float,
):
    """Single-lane ``solve_fn`` (for run_mpc / run_tracking_mpc) on the
    fused kernel: the lane rides a padded tile."""
    import jax

    def fn(xs, goals, X, U, state=None):
        st = None
        if state is not None:
            st = SolverState(rho=jnp.reshape(state.rho, (1,)))
        res = batch_solve(
            model, cost_cfg, sqp_cfg, dt,
            xs[None], goals[None], X[None], U[None], state=st,
        )
        return SQPResult(
            X=res.X[0],
            U=res.U[0],
            state=SolverState(rho=res.state.rho[0]),
            stats=jax.tree.map(lambda a: a[0], res.stats),
        )

    return fn


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
    tile: Optional[int] = None,
    interpret: bool = False,
) -> SQPResult:
    """Lane-batched SQP solve on the fused TPU kernel.

    xs_b: (B, 12), goals_b: (B, N, 3), X_b: (B, N, 12), U_b: (B, N-1, 6),
    wrench_world_batch: (B, 6) or None.  B must be a multiple of ``tile``
    (default: min(B, 128)).  ``interpret=True`` runs the kernel body in
    pallas interpret mode (CPU rig — lets the sharded production path be
    exercised on the virtual multi-device mesh without TPU hardware).
    """
    if cost_cfg.formulation != "gn":
        raise ValueError("pallas solver implements the 'gn' formulation only")
    B = xs_b.shape[0]
    # Pad the lane axis to a multiple of 8 (sublane tiling); a B=1 solve
    # just rides a mostly-idle tile.
    pad = (-B) % 8
    if pad:
        def _pad(a):
            return jnp.concatenate(
                [a, jnp.repeat(a[-1:], pad, axis=0)], axis=0
            )

        xs_b = _pad(xs_b)
        goals_b = _pad(goals_b)
        X_b = _pad(X_b)
        U_b = _pad(U_b)
        if wrench_world_batch is not None:
            wrench_world_batch = _pad(wrench_world_batch)
        if state is not None:
            state = SolverState(rho=_pad(state.rho))
    Bp = B + pad
    tile = tile or min(Bp, 128)
    rho_b = None
    if state is not None:
        rho_b = state.rho.astype(jnp.float32)

    X, U, rho, alphas, steps = sqp_kernel.sqp_solve_pallas(
        model, cost_cfg, sqp_cfg, dt,
        jnp.asarray(xs_b, jnp.float32).T,
        jnp.transpose(jnp.asarray(goals_b, jnp.float32), (1, 2, 0)),
        jnp.transpose(jnp.asarray(X_b, jnp.float32), (1, 2, 0)),
        jnp.transpose(jnp.asarray(U_b, jnp.float32), (1, 2, 0)),
        wrench_b=(
            None if wrench_world_batch is None
            else jnp.asarray(wrench_world_batch, jnp.float32).T
        ),
        rho_b=rho_b,
        tile=tile,
        interpret=interpret,
    )
    return SQPResult(
        X=jnp.transpose(X, (2, 0, 1))[:B],
        U=jnp.transpose(U, (2, 0, 1))[:B],
        state=SolverState(rho=rho[:B]),
        stats=SQPStats(
            # Accepted-step count (rejected-then-done iterations are not
            # distinguishable from early exit in the fused kernel's logs).
            iterations=jnp.sum((alphas > 0).astype(jnp.int32), axis=0)[:B],
            step_sizes=steps.T[:B],
            alphas=alphas.T[:B],
        ),
    )
