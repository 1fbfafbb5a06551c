from .kinematics import joint_frames, ee_pos, tcp_pos, ee_pos_jacobian
from .rnea import (
    rnea,
    crba,
    bias_forces,
    forward_dynamics,
    world_wrench_to_ee_joint,
)
from .aba import aba, forward_dynamics_aba
from .integrators import euler_step, rk4_step, split_state

__all__ = [
    "joint_frames",
    "ee_pos",
    "tcp_pos",
    "ee_pos_jacobian",
    "rnea",
    "crba",
    "bias_forces",
    "forward_dynamics",
    "world_wrench_to_ee_joint",
    "aba",
    "forward_dynamics_aba",
    "euler_step",
    "rk4_step",
    "split_state",
]
