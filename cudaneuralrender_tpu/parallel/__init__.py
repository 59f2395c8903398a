"""Multi-chip scaling + elasticity: device meshes (mesh.py), tile-sharded
rendering over jax.sharding (sharding.py), multi-host execution + per-host
tile I/O (multihost.py), fault-tolerant band retry (fault.py), and the
multi-parallelism dry run (dryrun.py)."""

from . import fault, mesh, multihost, sharding
from .fault import FaultInjector, render_tiled
from .mesh import data_sharding, make_mesh, replicated, tp_mlp_shardings
from .multihost import global_mesh, render_global
from .sharding import (
    pixel_train_step_sharded,
    render_image_sharded,
    render_image_sharded_staged,
    shard_load_stats,
    solve_surface_sharded,
)

__all__ = [
    "FaultInjector",
    "data_sharding",
    "fault",
    "global_mesh",
    "make_mesh",
    "mesh",
    "multihost",
    "render_global",
    "render_image_sharded",
    "render_image_sharded_staged",
    "shard_load_stats",
    "render_tiled",
    "replicated",
    "sharding",
    "solve_surface_sharded",
    "tp_mlp_shardings",
]
