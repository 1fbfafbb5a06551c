"""ctypes bindings to the native C++ plant (native/plant/libindy7plant.so).

The native plant is the framework's ground-truth physics process for
external-plant mode (the sim_node.cpp equivalent); these bindings expose
its RBD core in-process for parity tests against the JAX dynamics layer
and for host-side replay.  Build with ``make -C native/plant``.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(__file__), "..", "..", "native", "plant",
    "libindy7plant.so",
)
_lib = None


def available() -> bool:
    return os.path.exists(_LIB_PATH)


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(_LIB_PATH)
        dp = ctypes.POINTER(ctypes.c_double)
        lib.indy7_ee_position.argtypes = [dp, dp]
        lib.indy7_forward_dynamics.argtypes = [dp, dp, dp, dp]
        lib.indy7_rnea.argtypes = [dp, dp, dp, ctypes.c_int, dp]
        lib.indy7_rk4_step.argtypes = [dp, dp, ctypes.c_double, dp, dp]
        lib.indy7_perturbed_rk4_step.argtypes = [
            dp, dp, ctypes.c_double, dp, ctypes.c_double, ctypes.c_uint64,
            ctypes.c_double, ctypes.c_double, dp,
        ]
        lib.indy7_apply_joint_limits.argtypes = [dp, ctypes.c_int]
        _lib = lib
    return _lib


def _arr(x, n):
    a = np.ascontiguousarray(np.asarray(x, np.float64).reshape(n))
    return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def ee_position(q) -> np.ndarray:
    lib = _load()
    _, qp = _arr(q, 6)
    out = np.zeros(3)
    lib.indy7_ee_position(qp, out.ctypes.data_as(
        ctypes.POINTER(ctypes.c_double)))
    return out


def forward_dynamics(x, tau, wrench_world: Optional[np.ndarray] = None):
    lib = _load()
    _, xp = _arr(x, 12)
    _, tp = _arr(tau, 6)
    wp = None
    if wrench_world is not None:
        _, wp = _arr(wrench_world, 6)
    out = np.zeros(6)
    lib.indy7_forward_dynamics(
        xp, tp, wp, out.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    )
    return out


def rnea(q, v, a, gravity: bool = True) -> np.ndarray:
    lib = _load()
    _, qp = _arr(q, 6)
    _, vp = _arr(v, 6)
    _, ap = _arr(a, 6)
    out = np.zeros(6)
    lib.indy7_rnea(
        qp, vp, ap, int(gravity),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def rk4_step(x, u, dt: float, wrench_world: Optional[np.ndarray] = None):
    lib = _load()
    _, xp = _arr(x, 12)
    _, up = _arr(u, 6)
    wp = None
    if wrench_world is not None:
        _, wp = _arr(wrench_world, 6)
    out = np.zeros(12)
    lib.indy7_rk4_step(
        xp, up, ctypes.c_double(dt), wp,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out


def apply_joint_limits(x, velocity_saturation: bool = False) -> np.ndarray:
    """Joint range (and optional velocity-saturation) enforcement — the
    plant-side pass run after every substep; parity surface for
    sim/plant.py apply_joint_limits."""
    lib = _load()
    a, xp = _arr(x, 12)
    lib.indy7_apply_joint_limits(xp, int(velocity_saturation))
    return a


def perturbed_rk4_step(
    x, u, dt: float,
    wrench_world: Optional[np.ndarray] = None,
    pct: float = 0.0,
    seed: int = 0,
    kv: float = 0.0,
    kc: float = 0.0,
):
    """One step of the mismatched plant (seeded inertial error + joint
    friction) — parity surface for sim/plant.py perturb_model."""
    lib = _load()
    _, xp = _arr(x, 12)
    _, up = _arr(u, 6)
    wp = None
    if wrench_world is not None:
        _, wp = _arr(wrench_world, 6)
    out = np.zeros(12)
    lib.indy7_perturbed_rk4_step(
        xp, up, ctypes.c_double(dt), wp, ctypes.c_double(pct),
        ctypes.c_uint64(seed), ctypes.c_double(kv), ctypes.c_double(kc),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return out
