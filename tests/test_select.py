"""Production-solver auto-selection (solvers/select.py).

The fallback from the fused kernel to the readable vmap solver costs
~40x on TPU; it must never happen silently (VERDICT r3 weak #7).
"""
import logging

import pytest

from indy7_mpc_tpu.config import CostConfig, SQPConfig
from indy7_mpc_tpu.solvers import select


class _FakeTpu:
    platform = "tpu"
    device_kind = "TPU v5 lite"


class _FakeCpu:
    platform = "cpu"
    device_kind = "cpu"


def test_kernel_supports_predicate():
    assert select.kernel_supports(CostConfig(), SQPConfig())
    assert not select.kernel_supports(
        CostConfig(formulation="reference"), SQPConfig()
    )
    assert not select.kernel_supports(
        CostConfig(), SQPConfig(qp_backend="pcg")
    )


def test_tpu_slow_path_fallback_warns(model32, caplog):
    """A TPU device landing on the vmap solver must emit a warning."""
    with caplog.at_level(logging.WARNING, logger="indy7_mpc_tpu.solvers.select"):
        select.default_batch_solve_fn(
            model32, CostConfig(), SQPConfig(qp_backend="pcg"), 0.01,
            device=_FakeTpu(),
        )
    assert any("40x slower" in r.message for r in caplog.records)

    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="indy7_mpc_tpu.solvers.select"):
        select.default_single_solve_fn(
            model32, CostConfig(formulation="reference"), SQPConfig(), 0.01,
            device=_FakeTpu(),
        )
    assert any("40x slower" in r.message for r in caplog.records)


def test_cpu_fallback_is_silent(model32, caplog):
    """The vmap solver IS the production path off-TPU: no warning."""
    with caplog.at_level(logging.WARNING, logger="indy7_mpc_tpu.solvers.select"):
        select.default_batch_solve_fn(
            model32, CostConfig(), SQPConfig(qp_backend="pcg"), 0.01,
            device=_FakeCpu(),
        )
    assert not caplog.records


def test_sharded_auto_backend_warns_on_unsupported_config(model32, caplog):
    """'auto' under a TPU mesh with an uncovered config resolves to vmap
    WITH the warning (parallel/sharding.py _resolve_backend)."""
    from unittest import mock

    from indy7_mpc_tpu.parallel import sharding

    mesh = mock.Mock()
    mesh.devices = __import__("numpy").asarray([_FakeTpu()])
    with caplog.at_level(logging.WARNING, logger="indy7_mpc_tpu.solvers.select"):
        backend = sharding._resolve_backend(
            "auto", mesh, CostConfig(), SQPConfig(qp_backend="admm")
        )
    assert backend == "vmap"
    assert any("40x slower" in r.message for r in caplog.records)
