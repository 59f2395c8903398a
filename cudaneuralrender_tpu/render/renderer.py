"""High-level renderer: camera + neural SDF -> image.

TPU-native replacement for the reference's render orchestration
(render_kernel host loop, src/volumeRender_kernel.cu:608-692, plus the
offline/interactive modes of src/main.cpp:404-519). The whole frame —
ray setup, bounding-sphere cull, the full sphere-trace loop, normals and
shading — is ONE jitted XLA program: zero per-step host syncs (the reference
pays a device->host batch-size read every march step, :562) and no persistent
device buffers to manage (the reference's global Matrix pool, :578-606).

``render_image`` is the pure functional core (params, camera, frame) -> rgba;
``Renderer`` wraps it with jit caching, staged-compaction orchestration, and
host-side frame conversion.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import mlp
from ..models.mlp import MLPParams
from ..ops import camera as camera_lib
from ..ops import compaction, march, sdf, shading
from ..ops.camera import Camera
from ..utils import image_io
from ..utils.config import RenderConfig


def neural_sdf_fn(params: MLPParams, frame, num_inputs: int = 3, dtype=None):
    """Wrap MLP params as an SdfFn over (..., 3) points.

    num_inputs=4 appends the frame number as a 4th input — animation mode
    (c_numInputs==4, createBatch volumeRender_kernel.cu:533-544).
    Output is the raw pre-tanh logit (see models/mlp.py docstring).
    """

    def fn(p: jax.Array) -> jax.Array:
        x = p
        if num_inputs == 4:
            f = jnp.broadcast_to(jnp.asarray(frame, p.dtype), p.shape[:-1] + (1,))
            x = jnp.concatenate([p, f], axis=-1)
        return mlp.apply_scalar(params, x)

    return fn


def scene_fn(params: Optional[MLPParams], config: RenderConfig, frame):
    """Compose the scene SDF for a config (replaces the hardcoded sceneSDF,
    volumeRender_kernel.cu:217-230)."""
    neural = None
    if params is not None:
        neural = neural_sdf_fn(params, frame, config.num_inputs)
    return sdf.make_scene(config.scene, neural, frame)


@functools.partial(jax.jit, static_argnames=("config",))
def render_image(
    params: Optional[MLPParams],
    camera: Camera,
    config: RenderConfig,
    matcap: Optional[jax.Array] = None,
    frame: jax.Array | float = 0.0,
) -> jax.Array:
    """Render one frame. Returns [H, W, 4] float32 rgba in [0,1], row 0 =
    image bottom (see ops/camera.py; flip at save via image_io.to_uint8_image).

    Equivalent of one full render_kernel invocation + shading
    (volumeRender_kernel.cu:608-692) as a single compiled program.
    """
    cam_to_world, world_to_cam = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    f = scene_fn(params, config, frame)

    if config.march_impl == "fori":
        result = march.sphere_trace_unrolled(
            f,
            origin,
            dirs,
            num_steps=config.max_steps,
            march_eps=config.march_eps,
            bound_center=config.bound_center,
            bound_radius=config.bound_radius,
        )
    else:
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
    # Non-hit rays -> BACKGROUND_COLOR = 0 (volumeRender_kernel.cu:57).
    rgba = jnp.where(result.hit[:, None], colors, 0.0)
    return rgba.reshape(config.height, config.width, 4)


@functools.partial(jax.jit, static_argnames=("config", "num_steps"))
def _stage_step(params, origin, dirs, state, config: RenderConfig, frame, num_steps: int):
    """One compaction stage: march up to num_steps dense steps."""
    f = scene_fn(params, config, frame)
    return march.march_stage(
        f,
        origin,
        dirs,
        state,
        num_steps=num_steps,
        max_steps=config.max_steps,
        march_eps=config.march_eps,
    )


@functools.partial(jax.jit, static_argnames=("config",))
def _shade_final(params, origin, dirs, t, hit, world_to_cam, config: RenderConfig, matcap, frame):
    f = scene_fn(params, config, frame)
    points = origin + dirs * t[:, None]
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
    rgba = jnp.where(hit[:, None], colors, 0.0)
    return rgba.reshape(config.height, config.width, 4)


def render_staged(
    params: Optional[MLPParams],
    camera: Camera,
    config: RenderConfig,
    matcap: Optional[jax.Array] = None,
    frame: jax.Array | float = 0.0,
) -> jax.Array:
    """Staged-compaction render — the fast path for deep marches.

    Sphere tracing has a long straggler tail (measured on plane_1 at 512²:
    the march needs 2114 steps to resolve every ray, but after 64 steps only
    1.9% are still active, after 256 steps 0.14%). A dense march pays the
    whole image's MLP cost for every straggler step; the reference solves
    this with per-step stream compaction and a forced host sync each
    iteration (volumeRender_kernel.cu:549-576, :562). Here compaction is
    *staged*: march ``config.stage_steps`` dense steps, then re-pack the
    survivors into a power-of-two capacity bucket and continue with
    geometrically growing stage lengths — O(log max_steps) host syncs total
    and one compiled program per (config, bucket) pair.
    """
    cam_to_world, world_to_cam = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    frame = jnp.asarray(frame, jnp.float32)

    stage_len = config.stage_steps
    full = march.init_state(origin, dirs, config.bound_center, config.bound_radius)
    full = _stage_step(params, origin, dirs, full, config, frame, stage_len)

    while True:
        active_count = int(jnp.sum(full.active))
        steps_done = int(full.steps)
        if active_count == 0 or steps_done >= config.max_steps:
            break
        stage_len = min(stage_len * 2, config.max_steps - steps_done)
        cap = compaction.capacity_bucket(active_count)
        if cap >= full.t.shape[0]:
            full = _stage_step(params, origin, dirs, full, config, frame, stage_len)
            continue
        idx, valid = compaction.compact_indices(full.active, cap)
        sub = march.MarchState(
            t=full.t[idx],
            budget=full.budget[idx],
            active=full.active[idx] & valid,
            converged=full.converged[idx] & valid,
            steps=full.steps,
        )
        sub = _stage_step(params, origin, dirs[idx], sub, config, frame, stage_len)
        t, budget, active, converged = compaction.scatter_state(
            (full.t, full.budget, full.active, full.converged),
            (sub.t, sub.budget, sub.active, sub.converged),
            idx,
            valid,
        )
        full = march.MarchState(t, budget, active, converged, steps=sub.steps)

    return _shade_final(
        params, origin, dirs, full.t, full.converged, world_to_cam, config, matcap, frame
    )


class Renderer:
    """Stateful convenience wrapper (jit cache + assets), the API surface a
    user of the reference's neuralSDFRenderer binary would reach for."""

    def __init__(
        self,
        params: Optional[MLPParams],
        config: RenderConfig,
        matcap: Optional[np.ndarray] = None,
    ):
        config.validate()
        self.params = params
        self.config = config
        self.matcap = jnp.asarray(matcap) if matcap is not None else None
        if config.shading == "matcap" and self.matcap is None:
            raise ValueError("matcap shading requires a matcap texture")

    def render(self, camera: Camera, frame: float = 0.0) -> jax.Array:
        """Render to [H, W, 4] float rgba (device array)."""
        if self.config.use_pallas:
            from ..pallas import megakernel

            return megakernel.render_image_pallas(
                self.params, camera, self.config, self.matcap, frame
            )
        if self.config.march_impl == "staged":
            return render_staged(self.params, camera, self.config, self.matcap, frame)
        return render_image(self.params, camera, self.config, self.matcap, frame)

    def render_frame(self, camera: Camera, frame: float = 0.0, *, parity_flip: bool = False) -> np.ndarray:
        """Render to a host uint8 [H, W, 4] image (top-down rows)."""
        rgba = self.render(camera, frame)
        return image_io.to_uint8_image(np.asarray(rgba), parity_flip=parity_flip)

    def save_frame(self, path: str, camera: Camera, frame: float = 0.0) -> None:
        img = self.render_frame(camera, frame)
        if path.lower().endswith(".ppm"):
            image_io.save_ppm(path, img)
        else:
            image_io.save_png(path, img)
