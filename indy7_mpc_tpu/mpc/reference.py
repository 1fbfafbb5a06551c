"""Reference trajectory generators (host-side setup data).

Reproduces both reference generators:
  * ``figure8`` (/root/reference/gato_controller.py:21-46) — fixed
    45-degree rotation about z;
  * ``figure_8`` (/root/reference/src/mpc/mpc/reference_traj.py:4-29) —
    parameterized ``angle_offset``.

Outputs are (T, 3) EE position arrays; :func:`flatten6` converts to the
reference's flat ``[x, y, z, 0, 0, 0]`` layout for parity tests.
"""
from __future__ import annotations

import numpy as np


def figure_8(
    x_amplitude: float,
    z_amplitude: float,
    offset,
    timestep: float,
    period: float,
    num_periods: int,
    angle_offset: float = np.pi / 4,
) -> np.ndarray:
    """Rotated figure-8 in the x-z plane, returned as (T, 3) positions."""
    t = np.linspace(0.0, 2 * np.pi, int(period / timestep))
    pts = np.stack(
        [
            offset[0] + x_amplitude * np.sin(t),
            np.full_like(t, offset[1]),
            offset[2] + z_amplitude * np.sin(2 * t) / 2 + z_amplitude / 2,
        ],
        axis=-1,
    )
    c, s = np.cos(angle_offset), np.sin(angle_offset)
    R = np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])
    pts = pts @ R.T
    return np.tile(pts, (num_periods, 1))


def figure8(A_x, A_z, offset, period, dt, cycles) -> np.ndarray:
    """The gato_controller.py:21-46 parameterization (45-degree rotation)."""
    return figure_8(A_x, A_z, offset, dt, period, cycles, np.pi / 4)


def with_padding(ref: np.ndarray, pad_steps: int) -> np.ndarray:
    """Prepend ``pad_steps`` copies of the first point
    (gato_controller.py:322-323)."""
    return np.concatenate([np.tile(ref[:1], (pad_steps, 1)), ref], axis=0)


def flatten6(ref: np.ndarray) -> np.ndarray:
    """(T, 3) -> flat [x, y, z, 0, 0, 0] * T (reference wire format)."""
    out = np.zeros((ref.shape[0], 6))
    out[:, :3] = ref
    return out.reshape(-1)


def goal_window(ref: np.ndarray, offset: int, N: int) -> np.ndarray:
    """Slide the N-knot goal window (gato_controller.py:214-216)."""
    return ref[offset : offset + N]
