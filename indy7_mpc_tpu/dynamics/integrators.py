"""Fixed-step integrators matching the reference's semantics.

* :func:`euler_step` mirrors the linearization/merit integrator of the
  reference (``pin.integrate`` + explicit-Euler velocity update,
  /root/reference/src/osqp_sqp.py:40-42, src/osqp_solver.py:76-79).
* :func:`rk4_step` mirrors ``rk4`` in /root/reference/src/utils.py:3-18,
  including its averaged-velocity position update.

All steps broadcast over leading batch dims and are ``vmap``/``scan``-safe.
States are ``x = [q, v]`` with shape ``(*batch, 2 nj)``.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..models.robot import RobotModel
from .rnea import forward_dynamics


def split_state(model: RobotModel, x):
    return x[..., : model.nq], x[..., model.nq :]


def _friction_torque(v, friction):
    """Unmodeled joint friction tau_f = -kv v - kc tanh(v / 0.01).

    ``friction`` is (viscous kv, coulomb kc); the tanh smooths the Coulomb
    sign so the plant dynamics stay C^1 for the integrator.
    """
    kv, kc = friction
    return -kv * v - kc * jnp.tanh(v / 0.01)


def euler_step(model: RobotModel, x, u, dt, f_ext_ee=None, friction=None):
    """Explicit Euler: q+ = q + v dt,  v+ = v + a(q, v, u) dt."""
    q, v = split_state(model, x)
    ue = u if friction is None else u + _friction_torque(v, friction)
    a = forward_dynamics(model, q, v, ue, f_ext_ee=f_ext_ee)
    return jnp.concatenate([q + v * dt, v + a * dt], axis=-1)


def rk4_step(model: RobotModel, x, u, dt, f_ext_ee=None, friction=None):
    """RK4 with the reference's averaged-velocity position update.

    ``friction=(kv, kc)`` adds joint friction inside every stage
    evaluation (plant-side model mismatch; config.PlantConfig).
    """
    q, v = split_state(model, x)
    if friction is None:
        fd = lambda q_, v_: forward_dynamics(
            model, q_, v_, u, f_ext_ee=f_ext_ee
        )
    else:
        fd = lambda q_, v_: forward_dynamics(
            model, q_, v_, u + _friction_torque(v_, friction),
            f_ext_ee=f_ext_ee,
        )
    k1q = v
    k1v = fd(q, v)
    q2 = q + k1q * (dt / 2)
    k2q = v + k1v * (dt / 2)
    k2v = fd(q2, k2q)
    q3 = q + k2q * (dt / 2)
    k3q = v + k2v * (dt / 2)
    k3v = fd(q3, k3q)
    q4 = q + k3q * dt
    k4q = v + k3v * dt
    k4v = fd(q4, k4q)
    v_next = v + (dt / 6) * (k1v + 2 * k2v + 2 * k3v + k4v)
    avg_v = (k1q + 2 * k2q + 2 * k3q + k4q) / 6
    q_next = q + avg_v * dt
    return jnp.concatenate([q_next, v_next], axis=-1)
