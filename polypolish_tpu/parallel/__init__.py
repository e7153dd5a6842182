from polypolish_tpu.parallel.mesh import make_mesh, mesh_shape_for
from polypolish_tpu.parallel.shard import (
    bucket_events_for_mesh,
    make_sharded_polish_step,
    sharded_vote_consensus,
)

__all__ = [
    "make_mesh",
    "mesh_shape_for",
    "bucket_events_for_mesh",
    "make_sharded_polish_step",
    "sharded_vote_consensus",
]
