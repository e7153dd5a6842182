from polypolish_tpu.parallel.mesh import make_mesh, mesh_shape_for
from polypolish_tpu.parallel.shard import (
    bucket_events_for_mesh,
    bucket_lanes_for_mesh,
    get_sharded_polish_step_lanes,
    make_sharded_polish_step,
    make_sharded_polish_step_lanes,
    sharded_vote_consensus,
    sharded_vote_consensus_lanes,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "bucket_events_for_mesh",
    "bucket_lanes_for_mesh",
    "get_sharded_polish_step_lanes",
    "make_sharded_polish_step",
    "make_sharded_polish_step_lanes",
    "sharded_vote_consensus",
    "sharded_vote_consensus_lanes",
]
