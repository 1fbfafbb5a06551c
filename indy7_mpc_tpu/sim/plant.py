"""Device-resident plant: the TPU-native replacement for the MuJoCo sim node.

The reference runs a separate C++ MuJoCo process wired over ROS 2 DDS
(/root/reference/src/sim/sim/sim_node.cpp:284-347) and, offline, a
Pinocchio RK4 stepper (src/gato_mpc_batch_sample.py:166-189).  Here the
plant is a jitted, vmappable rollout co-resident with the solver, so the
controller<->plant transport disappears entirely (SURVEY.md section 5.8).

External world-frame forces at the EE replicate ``mj_applyFT``/
``oMi[6].actInv`` behavior: the wrench is expressed about the world origin
and re-mapped to the EE joint frame at the state where the step begins
(gato_mpc_batch_sample.py:151-161).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..dynamics.integrators import rk4_step
from ..dynamics.rnea import world_wrench_to_ee_joint
from ..models.robot import RobotModel


def plant_step(
    model: RobotModel,
    x,
    u,
    dt: float,
    wrench_world: Optional[jnp.ndarray] = None,
    substeps: int = 1,
    clamp_torque: bool = True,
):
    """Advance the plant by ``dt`` under constant torque ``u``.

    RK4 with ``substeps`` sub-intervals; the external wrench is re-mapped
    to the EE joint frame at the start of each substep (the reference maps
    once per control interval; substeps=1 reproduces that exactly).
    Torques are clamped to the actuator effort limits, matching the MuJoCo
    plant's ``ctrlrange`` (description/indy7.xml:52-59).
    Broadcasts over leading batch dims.
    """
    if clamp_torque:
        u = jnp.clip(u, -model.effort_limit, model.effort_limit)
    h = dt / substeps

    def sub(x, _):
        f_l = None
        if wrench_world is not None:
            f_l = world_wrench_to_ee_joint(model, x[..., : model.nq], wrench_world)
        return rk4_step(model, x, u, h, f_ext_ee=f_l), None

    if substeps == 1:
        return sub(x, None)[0]
    return jax.lax.scan(sub, x, None, length=substeps)[0]


def predict_next_states(model: RobotModel, x, u, dt: float, wrench_batch):
    """Batched one-step prediction under each wrench hypothesis.

    The analog of the CUDA solver's ``sim_forward`` used for consensus
    scoring (gato_controller.py:105-118): same (x, u) in every lane, one
    wrench per lane.  Returns (B, nx).
    """

    def one(w):
        return plant_step(model, x, u, dt, wrench_world=w)

    return jax.vmap(one)(wrench_batch)
