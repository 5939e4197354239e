"""Multi-chip parallelism: device meshes, sharded search, sharded training.

The reference is single-node CPU (SURVEY.md section 2.8: rayon/tokio only,
no NCCL/MPI); its scaling dimension — corpus size — maps TPU-natively to
sharding the embedding matrix over a device mesh with per-shard top-k and
a k-way merge over ICI (BASELINE config 5), and the encoder trains/serves
with dp x tp sharding via pjit + XLA collectives.
"""

from codegraph_tpu.parallel.mesh import make_mesh, default_mesh_shape
from codegraph_tpu.parallel.pipeline import pp_encode
from codegraph_tpu.parallel.ring_attention import ring_attention, sp_ring_encode
from codegraph_tpu.parallel.sharded_ivf import ShardedIVFIndex
from codegraph_tpu.parallel.sharded_ivfpq import ShardedIVFPQIndex
from codegraph_tpu.parallel.sharded_search import (
    ShardedFlatIndex,
    ShardedInt8Index,
    sharded_topk,
    sharded_topk_2d,
    sharded_topk_hier,
    sharded_topk_int8,
)

__all__ = [
    "make_mesh",
    "default_mesh_shape",
    "ShardedFlatIndex",
    "ShardedInt8Index",
    "ShardedIVFIndex",
    "ShardedIVFPQIndex",
    "pp_encode",
    "ring_attention",
    "sp_ring_encode",
    "sharded_topk",
    "sharded_topk_2d",
    "sharded_topk_hier",
    "sharded_topk_int8",
]
