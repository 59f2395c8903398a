"""Differentiable rendering via the implicit function theorem.

The reference renderer is inference-only; the north-star adds end-to-end
differentiability (pixel loss -> MLP weight gradients, BASELINE.json config 4).
Two estimators are provided:

  * unrolled — differentiate straight through a fixed-length march
    (ops/march.py::sphere_trace_unrolled, rematerialized scan). Exact but
    O(steps) backward cost.

  * implicit (this module) — march WITHOUT gradients to convergence, then
    recover d(t*)/d(theta) from the implicit function theorem: with
    f(theta, o + t d) = 0 at the surface,

        dt*/dtheta = - (df/dtheta) / (grad_x f . d)

    realized as the standard reattachment trick (IDR / differentiable
    volumetric rendering): t_diff = t0 - f_theta(x0) / stop_grad(grad f . d)
    where t0, x0 carry no gradient. Forward value = a Newton refinement of
    t0 (numerically closer to the true root); backward = exact implicit
    gradient. O(1) memory in march length.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..models.mlp import MLPParams
from ..ops import camera as camera_lib
from ..ops import march, shading
from ..ops.camera import Camera
from ..render.renderer import scene_fn
from ..utils.config import RenderConfig


def _raw_gradient(f, points):
    """Unnormalized spatial gradient of the SDF at points (..., 3)."""

    def scalar(p):
        return jnp.reshape(f(p[None, :]), ())

    return jax.vmap(jax.grad(scalar))(points.reshape(-1, 3)).reshape(points.shape)


def implicit_surface_t(f, origin: jax.Array, dirs: jax.Array, t_star: jax.Array) -> jax.Array:
    """Reattach gradients to a converged ray parameter t_star.

    f must close over the parameters being differentiated; the returned t has
    the same forward value (up to one Newton step) but a backward rule
    implementing dt/dtheta = -f_theta / (grad_x f . d).
    """
    t0 = jax.lax.stop_gradient(t_star)
    x0 = jax.lax.stop_gradient(origin + dirs * t0[:, None])
    g = jax.lax.stop_gradient(_raw_gradient(f, x0))
    denom = jnp.sum(g * dirs, axis=-1)
    # Guard near-tangent rays (|grad.d| ~ 0 -> unstable gradient).
    denom = jnp.where(
        denom >= 0, jnp.maximum(denom, 1e-3), jnp.minimum(denom, -1e-3)
    )
    return t0 - f(x0) / denom


def _solve_t_dense(params, config: RenderConfig, frame, origin, dirs):
    """Gradient-severed in-trace surface solve: the dense whole-image march.

    The trajectory is a constant w.r.t. params; all parameter sensitivity
    re-enters through the implicit step. Used when the caller did not
    precompute (t_star, hit) with diff/solve.py::solve_surface.
    """
    params_sg = jax.lax.stop_gradient(params)
    f_sg = scene_fn(params_sg, config, jax.lax.stop_gradient(jnp.asarray(frame)))
    result = march.sphere_trace(
        f_sg,
        jax.lax.stop_gradient(origin),
        jax.lax.stop_gradient(dirs),
        max_steps=config.max_steps,
        march_eps=config.march_eps,
        bound_center=config.bound_center,
        bound_radius=config.bound_radius,
    )
    return result.t, result.hit


def render_depth_diff(
    params: MLPParams,
    camera: Camera,
    config: RenderConfig,
    frame: jax.Array | float = 0.0,
    *,
    t_star: Optional[jax.Array] = None,
    hit: Optional[jax.Array] = None,
):
    """Differentiable depth map: returns (t [H*W], hit [H*W] bool, no grad on
    hit). The smooth scalar field used for gradient-parity testing — pixel
    color adds shading nonlinearities, depth isolates the implicit-surface
    gradient itself.

    ``t_star``/``hit`` (both or neither): a precomputed gradient-severed
    surface solve, e.g. from diff/solve.py::solve_surface (the staged fast
    path). When omitted the dense march runs inside the trace.
    """
    if (t_star is None) != (hit is None):
        raise ValueError("pass both t_star and hit, or neither")
    cam_to_world, _ = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    f = scene_fn(params, config, frame)
    if t_star is None:
        t_star, hit = _solve_t_dense(params, config, frame, origin, dirs)
    t = implicit_surface_t(f, origin, dirs, t_star)
    return t, jax.lax.stop_gradient(hit)


def render_image_diff(
    params: MLPParams,
    camera: Camera,
    config: RenderConfig,
    matcap: Optional[jax.Array] = None,
    frame: jax.Array | float = 0.0,
    *,
    t_star: Optional[jax.Array] = None,
    hit: Optional[jax.Array] = None,
) -> jax.Array:
    """Differentiable render: gradients flow from pixels to params (and
    camera) through the implicit surface point and the shading normal.

    Non-hit pixels are background with zero gradient (silhouette gradients
    need a soft mask loss — see losses.py::silhouette_loss).

    ``t_star``/``hit`` (both or neither): a precomputed gradient-severed
    surface solve from diff/solve.py::solve_surface. With them this function
    is ONE SDF eval + one SDF gradient per pixel (plus shading) — the fast
    differentiable path; the march never appears in the trace. Without them
    the dense whole-image march runs gradient-severed inside.
    """
    if (t_star is None) != (hit is None):
        raise ValueError("pass both t_star and hit, or neither")
    cam_to_world, world_to_cam = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    f = scene_fn(params, config, frame)

    if t_star is None:
        t_star, hit = _solve_t_dense(params, config, frame, origin, dirs)
    hit = jax.lax.stop_gradient(hit)

    t = implicit_surface_t(f, origin, dirs, t_star)
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
