"""Figure-8 end-effector tracking MPC (single-hypothesis closed loop).

Equivalent of the reference's fig-8 runs with a batch-1 solver
(notebooks/gato_mpc_indy7_fig8.ipynb cell 2, ``run_mpc_fig8``;
gato_controller.py with batch_size=1): the N-knot goal window slides one
reference step per control tick, the solver warm-starts from its previous
solution with the measured state pinned, and the plant can carry an
unmodeled constant/wandering wrench.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CostConfig, MPCConfig, SQPConfig
from ..dynamics.kinematics import ee_pos
from ..models.robot import RobotModel
from ..sim.plant import plant_step
from ..solvers import sqp as sqp_mod


class TrackingCarry(NamedTuple):
    x: jnp.ndarray
    X: jnp.ndarray
    U: jnp.ndarray
    ref_offset: jnp.ndarray


class TrackingTrace(NamedTuple):
    tracking_error: jnp.ndarray
    ee_pos: jnp.ndarray
    ee_ref: jnp.ndarray
    q: jnp.ndarray
    u: jnp.ndarray
    sqp_iters: jnp.ndarray


def run_tracking_mpc(
    model: RobotModel,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    mpc_cfg: MPCConfig,
    x0,
    ref_traj,
    num_steps: int,
    wrench_world: Optional[jnp.ndarray] = None,
    solver_wrench: Optional[jnp.ndarray] = None,
):
    """Closed-loop fig-8 tracking.

    Args:
      ref_traj: (T_ref, 3) reference EE positions (T_ref >= num_steps + N).
      wrench_world: true disturbance on the plant (None = none).
      solver_wrench: wrench the solver models (None = unmodeled
        disturbance, the reference's batch-1 baseline configuration).
    """
    N, dt = mpc_cfg.N, mpc_cfg.dt
    ref_traj = jnp.asarray(ref_traj, x0.dtype)

    def tick(carry: TrackingCarry, _):
        goals = jax.lax.dynamic_slice_in_dim(ref_traj, carry.ref_offset, N, 0)
        res = sqp_mod.solve(
            model, cost_cfg, sqp_cfg, dt, carry.x, goals,
            carry.X, carry.U, wrench_world=solver_wrench,
        )
        u = res.U[0]
        x_next = plant_step(
            model, carry.x, u, dt,
            wrench_world=wrench_world, substeps=mpc_cfg.sim_substeps,
        )
        eep = ee_pos(model, carry.x[: model.nq])
        trace = TrackingTrace(
            tracking_error=jnp.linalg.norm(eep - goals[0]),
            ee_pos=eep,
            ee_ref=goals[0],
            q=carry.x[: model.nq],
            u=u,
            sqp_iters=res.stats.iterations,
        )
        new_carry = TrackingCarry(
            x=x_next,
            X=res.X.at[0].set(x_next),
            U=res.U,
            ref_offset=carry.ref_offset + 1,
        )
        return new_carry, trace

    carry0 = TrackingCarry(
        x=x0,
        X=jnp.zeros((N, model.nx), x0.dtype).at[0].set(x0),
        U=jnp.zeros((N - 1, model.nu), x0.dtype),
        ref_offset=jnp.asarray(0, jnp.int32),
    )
    return jax.lax.scan(tick, carry0, None, length=num_steps)
