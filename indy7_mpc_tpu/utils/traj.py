"""Trajectory layout utilities.

The framework's native layout is structured: ``X (N, nx)``, ``U (N-1, nu)``.
The reference uses a flat interleaved vector ``[x0, u0, x1, u1, ..., xN-1]``
of length ``N*(nx+nu) - nu`` (osqp_solver.py:22, gato_controller.py:181);
these converters provide parity with recorded data and tests.
"""
from __future__ import annotations

import jax.numpy as jnp


def pack_xu(X, U):
    """(N, nx), (N-1, nu) -> flat interleaved (N*(nx+nu) - nu,)."""
    N, nx = X.shape[-2], X.shape[-1]
    nu = U.shape[-1]
    body = jnp.concatenate([X[..., :-1, :], U], axis=-1).reshape(
        *X.shape[:-2], (N - 1) * (nx + nu)
    )
    return jnp.concatenate([body, X[..., -1, :]], axis=-1)


def unpack_xu(xu, N, nx, nu):
    """Flat interleaved -> ``(X (N, nx), U (N-1, nu))``."""
    body = xu[..., : (N - 1) * (nx + nu)].reshape(*xu.shape[:-1], N - 1, nx + nu)
    X = jnp.concatenate(
        [body[..., :nx], xu[..., None, (N - 1) * (nx + nu) :]], axis=-2
    )
    U = body[..., nx:]
    return X, U


def goals_from_flat(goals_flat, N):
    """Reference 6-per-knot goal vector -> (N, 3) positions.

    The reference appends three zero entries per knot
    (gato_controller.py:44); only xyz is used by the cost.
    """
    return goals_flat[..., : 6 * N].reshape(*goals_flat.shape[:-1], N, 6)[..., :3]
