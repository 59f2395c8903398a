"""Sharded rendering: tile rays across the ``data`` mesh axis.

The TPU-native answer to the reference's single-GPU march loop: rays are
independent, so the image is tile-sharded over chips with ``shard_map`` and
each shard runs its own dense masked march with *independent early exit* —
a shard whose rays all resolve stops marching immediately (per-shard
``lax.while_loop``), which is free compaction at shard granularity. No
cross-chip communication happens until the final image assembly (XLA
all_gathers the output only if the caller asks for a replicated image).

The sequence-parallel analogue (SURVEY.md §5 long-context row): rays are the
"sequence", tiles are the context shards, and there is no halo exchange
because sphere tracing has no cross-ray coupling.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.mlp import MLPParams
from ..ops import camera as camera_lib
from ..ops import march, shading
from ..ops.camera import Camera
from ..render.renderer import scene_fn
from ..utils.config import RenderConfig


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "data_axis")
)
def render_image_sharded(
    params: Optional[MLPParams],
    camera: Camera,
    config: RenderConfig,
    mesh: Mesh,
    matcap: Optional[jax.Array] = None,
    frame: jax.Array | float = 0.0,
    data_axis: str = "data",
) -> jax.Array:
    """Render with rays sharded over ``mesh``'s data axis.

    Requires config.num_rays divisible by the data-axis size. Returns the
    full [H, W, 4] image (sharded across devices on the row axis; convert
    with np.asarray to gather).
    """
    n_shards = mesh.shape[data_axis]
    if config.num_rays % n_shards:
        raise ValueError(
            f"rays ({config.num_rays}) not divisible by data axis ({n_shards})"
        )

    cam_to_world, world_to_cam = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    frame = jnp.asarray(frame, jnp.float32)

    spec_sharded = P(data_axis)
    spec_repl = P()

    def shard_body(params, origin, dirs, world_to_cam, matcap, frame):
        f = scene_fn(params, config, frame)
        result = march.sphere_trace(
            f,
            origin,
            dirs,
            max_steps=config.max_steps,
            march_eps=config.march_eps,
            bound_center=config.bound_center,
            bound_radius=config.bound_radius,
        )
        points = origin + dirs * result.t[:, None]
        colors = shading.shade(
            f,
            points,
            dirs,
            mode=config.shading,
            normal_mode=config.normal_mode,
            normal_eps=config.normal_eps,
            world_to_cam=world_to_cam,
            matcap=matcap,
        )
        return jnp.where(result.hit[:, None], colors, 0.0)

    rgba = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(spec_repl, spec_repl, spec_sharded, spec_repl, spec_repl, spec_repl),
        out_specs=spec_sharded,
        check_vma=False,
    )(params, origin, dirs, world_to_cam, matcap, frame)

    return rgba.reshape(config.height, config.width, 4)
