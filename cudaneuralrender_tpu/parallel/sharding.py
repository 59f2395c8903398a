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


@functools.partial(
    jax.jit, static_argnames=("config", "mesh", "lr", "data_axis")
)
def pixel_train_step_sharded(
    state,
    camera: Camera,
    target: jax.Array,
    config: RenderConfig,
    mesh: Mesh,
    lr: float = 1e-3,
    data_axis: str = "data",
    t_star: Optional[jax.Array] = None,
    hit: Optional[jax.Array] = None,
):
    """One tile-sharded inverse-rendering step (BASELINE config 5).

    Each chip marches its own ray tile (the sequence/context-parallel
    analogue — rays are the sequence, no halo exchange, SURVEY.md §5),
    reattaches gradients through the implicit surface (diff/implicit.py),
    computes its tile's squared pixel error, and the weight gradients are
    all-reduced over the mesh: params enter the shard_map replicated, so
    their backward cotangents psum across the data axis — XLA schedules that
    collective over ICI overlapped with the backward computation.

    ``t_star``/``hit`` (both or neither, [H*W] image-order): a precomputed
    gradient-severed surface solve (diff/solve.py::solve_surface — the
    staged fast path, host-orchestrated before this jitted step). They tile-
    shard over the data axis with the rays; the per-tile march disappears
    from the grad program entirely.

    Returns (new_state, loss). Sharded gradients are exactly equal to the
    single-device pixel_train_step gradients (tests/test_parallel.py).
    """
    import optax

    from ..diff import train as train_lib
    from ..diff.implicit import implicit_surface_t

    if (t_star is None) != (hit is None):
        raise ValueError("pass both t_star and hit, or neither")
    n_shards = mesh.shape[data_axis]
    if config.num_rays % n_shards:
        raise ValueError(
            f"rays ({config.num_rays}) not divisible by data axis ({n_shards})"
        )

    cam_to_world, world_to_cam = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    tgt = target.reshape(-1, 4)
    frame = jnp.zeros((), jnp.float32)

    def tile_sse(params, origin, dirs, tgt, world_to_cam, frame, t0, hit0):
        f = scene_fn(params, config, frame)
        if t0 is None:
            params_sg = jax.lax.stop_gradient(params)
            f_sg = scene_fn(params_sg, config, jax.lax.stop_gradient(frame))
            result = march.sphere_trace(
                f_sg,
                jax.lax.stop_gradient(origin),
                jax.lax.stop_gradient(dirs),
                max_steps=config.max_steps,
                march_eps=config.march_eps,
                bound_center=config.bound_center,
                bound_radius=config.bound_radius,
            )
            t0, hit0 = result.t, result.hit
        hit0 = jax.lax.stop_gradient(hit0)
        t = implicit_surface_t(f, origin, dirs, t0)
        points = origin + dirs * t[:, None]
        colors = shading.shade(
            f, points, dirs,
            mode=config.shading, normal_mode=config.normal_mode,
            normal_eps=config.normal_eps, world_to_cam=world_to_cam,
        )
        rgba = jnp.where(hit0[:, None], colors, 0.0)
        sse = jnp.sum((rgba - tgt) ** 2)
        return jax.lax.psum(sse, data_axis)

    def loss_fn(params):
        sse = jax.shard_map(
            tile_sse,
            mesh=mesh,
            in_specs=(
                P(), P(), P(data_axis), P(data_axis), P(), P(),
                None if t_star is None else P(data_axis),
                None if hit is None else P(data_axis),
            ),
            out_specs=P(),
            check_vma=False,
        )(params, origin, dirs, tgt, world_to_cam, frame, t_star, hit)
        return sse / tgt.size

    loss, grads = jax.value_and_grad(loss_fn)(state.params)
    opt = train_lib.make_optimizer(lr)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    return train_lib.TrainState(params, opt_state, state.step + 1), loss
