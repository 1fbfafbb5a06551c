from . import reference
from .point_to_goal import run_mpc, MPCTrace
from .tracking import run_tracking_mpc, TrackingTrace
from .sampled import (
    run_sampled_mpc,
    sampled_tick,
    init_wrench_batch,
    resample_wrench_batch,
    find_best_lane,
    SampledTrace,
)

__all__ = [
    "reference",
    "run_mpc",
    "MPCTrace",
    "run_tracking_mpc",
    "TrackingTrace",
    "run_sampled_mpc",
    "sampled_tick",
    "init_wrench_batch",
    "resample_wrench_batch",
    "find_best_lane",
    "SampledTrace",
]
