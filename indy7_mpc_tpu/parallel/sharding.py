"""Lane-axis sharding over a TPU mesh (ICI/DCN scale-out).

The reference scales by compiling CUDA solver templates for B in {1..256}
on one GPU (gato_controller.py:53-63).  Here the lane axis is a runtime
dimension sharded over a 1-D ``jax.sharding.Mesh``: XLA partitions the
vmapped solver with zero communication (lanes are independent), and the
consensus argmin (gato_controller.py:109-118, a CPU loop in the reference)
becomes a global on-device reduction over ICI.

SURVEY.md section 5.8: the batch/ensemble axis is what shards across
chips; the horizon axis stays per-chip (block-tridiagonal coupling).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import CostConfig, SampleConfig, SQPConfig
from ..models.robot import RobotModel
from ..solvers import sqp as sqp_mod

LANE_AXIS = "lanes"


def make_lane_mesh(devices=None) -> Mesh:
    """1-D mesh over all (or the given) devices; axis name ``lanes``."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices.reshape(-1), (LANE_AXIS,))


def lane_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (lane) axis, replicate everything else."""
    return NamedSharding(mesh, P(LANE_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_lanes(mesh: Mesh, tree):
    """Place every array in ``tree`` with its leading axis sharded."""
    s = lane_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), tree)


def make_sharded_batch_solve(
    model: RobotModel,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    dt: float,
    mesh: Mesh,
):
    """jit-compiled lane-sharded batched SQP solve.

    Returns ``fn(xs_b, goals_b, X_b, U_b, wrench_b) -> SQPResult`` with all
    lane-leading arrays sharded over the mesh.  B must be divisible by the
    mesh size.
    """
    lanes = lane_sharding(mesh)

    def fn(xs_b, goals_b, X_b, U_b, wrench_b):
        xs_b = jax.lax.with_sharding_constraint(xs_b, lanes)
        return sqp_mod.batch_solve(
            model, cost_cfg, sqp_cfg, dt, xs_b, goals_b, X_b, U_b,
            wrench_world_batch=wrench_b,
        )

    return jax.jit(
        fn,
        in_shardings=(lanes, lanes, lanes, lanes, lanes),
        out_shardings=None,
    )


def make_sharded_sampled_tick(
    model: RobotModel,
    cost_cfg: CostConfig,
    sqp_cfg: SQPConfig,
    sample_cfg: SampleConfig,
    dt: float,
    mesh: Mesh,
):
    """Full sampled-MPC control tick with the hypothesis batch sharded.

    The B SQP solves and the B one-step predictions are lane-sharded; the
    consensus ``argmin`` is a global cross-device reduction (XLA inserts
    the ICI collective).  Scalars/warm starts are replicated.
    """
    from ..mpc.sampled import sampled_tick

    lanes = lane_sharding(mesh)
    repl = replicated(mesh)

    def fn(key, x_obs, x_last, u_last, goals, X_warm, U_warm, f_batch):
        f_batch = jax.lax.with_sharding_constraint(f_batch, lanes)
        res = sampled_tick(
            model, cost_cfg, sqp_cfg, sample_cfg, dt,
            key, x_obs, x_last, u_last, goals, X_warm, U_warm, f_batch,
        )
        # Keep the resampled hypothesis batch lane-sharded so it feeds the
        # next tick directly (otherwise XLA may emit it replicated, which
        # mismatches in_shardings on the feedback edge).
        return res._replace(
            f_batch=jax.lax.with_sharding_constraint(res.f_batch, lanes)
        )

    return jax.jit(
        fn,
        in_shardings=(repl, repl, repl, repl, repl, repl, repl, lanes),
    )
