from .sharding import (
    LANE_AXIS,
    make_lane_mesh,
    lane_sharding,
    replicated,
    shard_lanes,
    make_sharded_batch_solve,
    make_sharded_sampled_tick,
    make_sharded_sampled_loop,
)

from . import distributed

__all__ = [
    "LANE_AXIS",
    "distributed",
    "make_lane_mesh",
    "lane_sharding",
    "replicated",
    "shard_lanes",
    "make_sharded_batch_solve",
    "make_sharded_sampled_tick",
    "make_sharded_sampled_loop",
]
