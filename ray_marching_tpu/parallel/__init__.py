"""Multi-chip / multi-host parallelism.

The scaling axis of this workload is rays/pixels (the reference is
single-GPU; SURVEY.md §2.7): the ray grid is sharded over the device mesh
while the O(10²)-scalar scene parameters are replicated. The march is
communication-free per ray; the only cross-shard coupling in the forward
pass is the global min/max image normalization in the distance/proximity/
laplacian shaders, and in the backward pass the replicated-parameter
gradient all-reduce — both expressed as XLA collectives.
"""

from ray_marching_tpu.parallel.sharding import (
    make_mesh,
    shard_render,
    make_train_step,
)

__all__ = ["make_mesh", "shard_render", "make_train_step"]
