"""Multi-chip scaling: meshes, sharded DCT, distributed top-k, DP/TP pipelines."""

from . import dct_sharded, mesh, pipeline_sharded, pipeline_staged, topk_sharded
from .mesh import DATA_AXIS, SPATIAL_AXIS, batch_sharding, make_mesh
from .pipeline_sharded import (
    embed_batch_sharded,
    embed_spatial,
    extract_batch_sharded,
    extract_spatial,
)
from .pipeline_staged import embed_staged, make_stage_mesh

__all__ = [
    "mesh", "dct_sharded", "topk_sharded", "pipeline_sharded",
    "pipeline_staged",
    "make_mesh", "batch_sharding", "DATA_AXIS", "SPATIAL_AXIS",
    "embed_batch_sharded", "extract_batch_sharded",
    "embed_spatial", "extract_spatial",
    "embed_staged", "make_stage_mesh",
]
