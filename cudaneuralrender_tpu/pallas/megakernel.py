"""Pallas TPU megakernel: the ENTIRE sphere-trace march fused in one kernel.

This is the TPU answer to the reference's hottest loop
(render_kernel, src/volumeRender_kernel.cu:652-689): where the CUDA version
launches `scan + gather + 9 GEMMs + march` kernels per step with a
device->host sync each iteration, here the whole march for a tile of rays —
point generation, the full MLP chain, and the step/converge/miss update —
runs inside a single ``pallas_call``:

  * MLP weights live in VMEM for the kernel's whole lifetime (~36 KB),
  * ray state (t, budget, masks) lives in registers/VMEM, ZERO HBM traffic
    per march step (the reference re-reads/writes points, masks, scan maps
    and activations from HBM every step),
  * each grid tile runs its own ``lax.while_loop`` with early exit — a tile
    whose rays all converge stops immediately, which is the compaction
    benefit (reference :549-576) at tile granularity with no gather at all,
  * activations stay TRANSPOSED [features, rays]: the 128-lane axis is
    always fully occupied by rays regardless of MLP width.

Supported scenes: the pure neural field (raw / tanh) — CSG composite scenes
march through the XLA path (render/renderer.py), which shares all semantics.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..models.mlp import MLPParams
from ..ops import camera as camera_lib
from ..ops import march, shading
from ..ops.camera import Camera
from ..utils.config import RenderConfig
from . import scenes
from .fused_mlp import (
    _mlp_chain, _mlp_chain_3pass, max_tile_for_width, pack_params,
    split_hi_lo,
)


def _march_megakernel(
    *all_refs,     # see ref layouts below
    n_layers: int,
    hidden: int,
    n_inputs: int,
    max_steps: int,
    march_eps: float,
    compose,
    precision=jax.lax.Precision.HIGHEST,
    num_steps: int | None = None,
    relax_omega: float = 0.0,
    three_pass: bool = False,
    track_resolve: bool = False,
    raygen: tuple | None = None,
):
    # Ref layouts.
    #   raygen=None (continue an existing state):
    #     dirs [3,T], t0 [1,T], budget0 [1,T], active0 [1,T],
    #     origin [3,1], frame [1,1], steps0 [1,1], weights..., outs...
    #   raygen=(W, H, focal, bound_center, bound_radius) (cold start —
    #   the coarse phase): rays are GENERATED in-kernel from the carried
    #   pixel index, eliminating the dense XLA ray-build + init pass and
    #   its [N,3] HBM round trips (~3.4 ms at 1080p):
    #     pos [1,T] int32 (pixel index, -1 = pad lane), c2w [3,4],
    #     frame [1,1], steps0 [1,1], weights..., outs...
    # weights: three_pass -> (w_hi [L,H,H] bf16, w_lo [L,H,H] bf16,
    # b [L,H]); else -> (w [L,H,H] f32, b [L,H]). Then the five outputs:
    # t, conv, budget, active, steps — all [1, T].
    if raygen is None:
        (dirs_ref, t0_ref, budget0_ref, active0_ref, origin_ref, frame_ref,
         steps0_ref, *refs) = all_refs
    else:
        pos_ref, c2w_ref, frame_ref, steps0_ref, *refs = all_refs
    if three_pass:
        w_hi_ref, w_lo_ref, b_ref = refs[:3]
        outs = refs[3:]
    else:
        w_ref, b_ref = refs[:2]
        outs = refs[2:]
    # steps_out is PER-LANE: the loop iteration at which each ray resolved
    # (converged or missed); unresolved/pad lanes report the tile's exit
    # step. Its max is the deepest march count (the staged scheduler's
    # global counter); the staged renderer also uses it directly as the
    # per-ray difficulty key for ordered packing (ops/compaction.py).
    t_out, conv_out, budget_out, active_out, steps_out = outs
    if raygen is None:
        dirs = dirs_ref[:]
        origin = origin_ref[:]
        t_init = t0_ref[:]
        budget_init = budget0_ref[:]
        active_init = active0_ref[:]
    else:
        # In-kernel ray generation + bounding-sphere init, mirroring
        # camera.ray_dirs_from_index + march.init_state (same formulas and
        # op order; per-lane results agree to f32 ulps — absorbed by the
        # refine ladder's HIGHEST re-march exactly like any coarse noise).
        img_w, img_h, focal, bcenter, bradius = raygen
        c2w = c2w_ref[:]                      # [3, 4]
        origin = c2w[:, 3:4]                  # [3, 1]
        pos = pos_ref[:]                      # [1, T] int32
        x = (pos % img_w).astype(jnp.float32)
        y = (pos // img_w).astype(jnp.float32)
        u = (x / img_w) * 2.0 - 1.0
        v = (y / img_h) * 2.0 - 1.0
        fw = jnp.full_like(u, -float(focal))
        inv = 1.0 / jnp.sqrt(u * u + v * v + fw * fw)
        du, dv, dw = u * inv, v * inv, fw * inv
        r = c2w[:, :3]
        dirs = jnp.concatenate(
            [
                r[0, 0] * du + r[0, 1] * dv + r[0, 2] * dw,
                r[1, 0] * du + r[1, 1] * dv + r[1, 2] * dw,
                r[2, 0] * du + r[2, 1] * dv + r[2, 2] * dw,
            ],
            axis=0,
        )  # [3, T]
        bcx, bcy, bcz = (float(v) for v in bcenter)
        qx = origin[0:1, :] - bcx   # [1,1] — scalar center components stay
        qy = origin[1:2, :] - bcy   # Python floats (a captured [3] array
        qz = origin[2:3, :] - bcz   # would be an illegal kernel constant)
        a = jnp.sum(dirs * dirs, axis=0, keepdims=True)
        b = 2.0 * (qx * dirs[0:1, :] + qy * dirs[1:2, :] + qz * dirs[2:3, :])
        c = qx * qx + qy * qy + qz * qz - float(bradius) * float(bradius)
        disc = b * b - 4.0 * a * c
        hit = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        tnear = jnp.maximum((-b - sq) / (2.0 * a), 0.0)
        tfar = (-b + sq) / (2.0 * a)
        t_init = jnp.where(hit, tnear, 0.0)
        budget_init = jnp.where(hit, tfar, 0.0)
        active_init = (hit & (pos >= 0)).astype(jnp.float32)
    T = dirs.shape[1]
    relax = bool(relax_omega and relax_omega > 1.0)

    def sdf(t):
        pts = origin + dirs * t  # [3, T]
        rows = [pts]
        if n_inputs == 4:
            rows.append(jnp.broadcast_to(frame_ref[0, 0], (1, T)))
        pad = hidden - n_inputs
        if pad:
            rows.append(jnp.zeros((pad, T), jnp.float32))
        # NOTE: a true [n_in, H] first-layer dot (fused_mlp._mlp_chain_from_pts,
        # no zero-pad rebuild) measured ~35% SLOWER end-to-end: Mosaic lowers
        # the K=3 contraction far worse than the padded K=32 one. Keep the
        # zero-padded entry.
        x = jnp.concatenate(rows, axis=0)  # [H, T]
        if three_pass:
            d = _mlp_chain_3pass(w_hi_ref, w_lo_ref, b_ref, x, n_layers)[0:1, :]
        else:
            d = _mlp_chain(w_ref, b_ref, x, n_layers, precision)[0:1, :]  # [1, T]
        # In-kernel CSG composition (reference sceneSDF runs inside its
        # march kernel too, volumeRender_kernel.cu:217-230): pure VPU math
        # on the [1, T] distance row, see pallas/scenes.py.
        return compose(pts, d, frame_ref[0, 0])

    start = steps0_ref[0, 0].astype(jnp.int32)

    def cond(carry):
        step, t, budget, active, conv, res = carry[:6]
        go = (step < max_steps) & (jnp.sum(active) > 0.0)
        if num_steps is not None:
            # Bounded rung (staged-schedule building block): advance at most
            # num_steps from the entry step count, like march.march_stage.
            go = go & (step - start < num_steps)
        return go

    def body(carry):
        # Same update order as singleMarch (volumeRender_kernel.cu:459-476):
        # budget check before the move, convergence after it.
        step, t, budget, active, conv, res = carry[:6]
        d = sdf(t)
        act = active > 0
        if relax:
            # Constant over-relaxed stepping, mirroring
            # march.march_stage_relaxed (see its docstring for the safety
            # argument): overstep omega*d, backtrack to the previous
            # plain-step position when safety spheres stop overlapping,
            # plain for one step after a failure.
            prev_r, step_len = carry[6:]
            sor_fail = act & (step_len > prev_r) & (d + prev_r < step_len)
            near = act & ~sor_fail & (d < march_eps)
            om = jnp.where(step_len < 0.0, 1.0, float(relax_omega))
            stepv = jnp.where(
                sor_fail, prev_r - step_len, jnp.where(near, d, om * d)
            )
        else:
            sor_fail = jnp.zeros_like(act)
            near = act & (d < march_eps)
            stepv = d
        budget = budget - jnp.where(act, stepv, 0.0)
        miss = act & ~sor_fail & (budget <= 0.0)
        moved = act & ~miss
        t = jnp.where(moved, t + stepv, t)
        conv_now = moved & near
        active = (moved & ~conv_now).astype(jnp.float32)
        conv = jnp.where(conv_now, 1.0, conv)
        if track_resolve:
            res = jnp.where(
                act & (active == 0.0), (step + 1).astype(jnp.float32), res
            )
        out = (step + 1, t, budget, active, conv, res)
        if relax:
            prev_r = jnp.where(moved & ~sor_fail, d, prev_r)
            step_len = jnp.where(moved, stepv, step_len)
            out = out + (prev_r, step_len)
        return out

    init = (
        start,
        t_init,
        budget_init,
        active_init,
        jnp.zeros_like(active_init),
        jnp.zeros_like(t_init) + start.astype(jnp.float32),
    )
    if relax:
        init = init + (jnp.zeros_like(t_init), jnp.zeros_like(t_init))
    final = jax.lax.while_loop(cond, body, init)
    step, t, budget, active, conv, res = final[:6]
    t_out[:] = t
    conv_out[:] = conv
    budget_out[:] = budget
    active_out[:] = active
    if track_resolve:
        # unresolved lanes report the tile's exit step (max difficulty seen)
        steps_out[:] = jnp.where(active > 0, step.astype(jnp.float32), res)
    else:
        steps_out[:] = jnp.broadcast_to(step.astype(jnp.float32), active.shape)


def march_pallas_state(
    params: MLPParams,
    origin: jax.Array,
    dirs: jax.Array,
    state: march.MarchState,
    config: RenderConfig,
    frame: jax.Array | float = 0.0,
    *,
    tile: int = 1024,
    interpret: bool = False,
    march_eps: float | None = None,
    precision=jax.lax.Precision.HIGHEST,
    num_steps: int | None = None,
    relax_omega: float = 0.0,
    return_resolve: bool = False,
    cyl_window: int | None = None,
) -> march.MarchState:
    """Continue an existing march state inside the megakernel.

    ``cyl_window`` overrides config.cyl_window for this call (the staged
    renderer's COARSE phase may use a cheaper, conservative window — see
    RenderConfig.cyl_window_coarse).

    ``return_resolve=True`` additionally returns the per-ray resolve step
    [n] float32 (the loop iteration at which each ray converged or missed)
    — the staged renderer's difficulty key for ordered bucket packing.

    The building block for the staged renderer's deep-straggler tail: once
    the survivors fit a small packed batch, thousands of sequential tiny
    steps are latency-bound in an XLA while_loop (one loop-iteration
    round trip per step), but run at VMEM speed inside the kernel.
    """
    weights, biases, n_in, hidden = pack_params(params)
    # Wide user MLPs (hidden 64-256) shrink the lane tile to stay inside
    # the VMEM budget (fused_mlp.max_tile_for_width); the shipped 32-wide
    # nets keep the caller's tile.
    tile = min(tile, max_tile_for_width(
        hidden, weights.shape[0],
        three_pass=(precision == jax.lax.Precision.HIGH)))
    n = dirs.shape[0]
    n_tiles = pl.cdiv(n, tile)
    n_pad = n_tiles * tile
    compose = scenes.compose_fn(
        config.scene,
        config.cyl_window if cyl_window is None else cyl_window,
    )
    if compose is None:
        raise ValueError(
            f"megakernel does not support scene {config.scene!r}; "
            "the XLA march path handles it"
        )
    # Mosaic lowers DEFAULT/HIGHEST dots only; HIGH runs as the emulated
    # 3-pass scheme on pre-split bf16 weight halves (fused_mlp.split_hi_lo).
    three_pass = precision == jax.lax.Precision.HIGH
    if three_pass:
        weight_inputs = (*split_hi_lo(weights), biases)
    else:
        weight_inputs = (weights, biases)

    def pad_row(x, fill=0.0):
        return jnp.full((1, n_pad), fill, jnp.float32).at[0, :n].set(x)

    dirs_t = jnp.zeros((3, n_pad), jnp.float32).at[:, :n].set(dirs.T)
    t0 = pad_row(state.t)
    budget0 = pad_row(state.budget)
    active0 = pad_row(state.active.astype(jnp.float32))  # pad lanes inactive

    kernel = functools.partial(
        _march_megakernel,
        n_layers=weights.shape[0],
        hidden=hidden,
        n_inputs=config.num_inputs,
        max_steps=config.max_steps,
        march_eps=config.march_eps if march_eps is None else march_eps,
        compose=compose,
        precision=precision,
        num_steps=num_steps,
        relax_omega=relax_omega,
        three_pass=three_pass,
        track_resolve=return_resolve,
    )

    row_spec = lambda: pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    t_arr, conv, budget, active, steps_arr = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((3, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            row_spec(),
            row_spec(),
            row_spec(),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # origin [3,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # frame [1,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # steps0 [1,1]
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_inputs),
        out_specs=(row_spec(), row_spec(), row_spec(), row_spec(), row_spec()),
        interpret=interpret,
    )(
        dirs_t,
        t0,
        budget0,
        active0,
        origin.reshape(3, 1).astype(jnp.float32),
        jnp.reshape(jnp.asarray(frame, jnp.float32), (1, 1)),
        jnp.reshape(state.steps.astype(jnp.float32), (1, 1)),
        *weight_inputs,
    )

    # steps taken inside the kernel varies per tile. Unbounded (terminal)
    # rungs exit only when dry or at max_steps, so actives remaining implies
    # max_steps was hit; bounded rungs ran exactly num_steps while actives
    # remained. Either way the reported counter stays a bound the staged
    # scheduler's schedule_ok check can rely on.
    if num_steps is None:
        # Run-to-dry: the scheduler's global counter advances by the deepest
        # tile's actual iteration count (the kernel reports it per lane).
        new_steps = jnp.max(steps_arr[0, :n]).astype(jnp.int32)
    else:
        new_steps = jnp.minimum(
            state.steps + jnp.asarray(num_steps, jnp.int32),
            jnp.asarray(config.max_steps, jnp.int32),
        )
    out_state = march.MarchState(
        t=t_arr[0, :n],
        budget=budget[0, :n],
        active=(active[0, :n] > 0.5) & state.active,
        converged=(conv[0, :n] > 0.5) | state.converged,
        steps=new_steps,
    )
    if return_resolve:
        return out_state, steps_arr[0, :n]
    return out_state


def march_pallas_raygen(
    params: MLPParams,
    cam_to_world: jax.Array,
    pos: jax.Array,
    config: RenderConfig,
    frame: jax.Array | float = 0.0,
    *,
    tile: int = 8192,
    interpret: bool = False,
    march_eps: float | None = None,
    precision=jax.lax.Precision.HIGHEST,
    relax_omega: float = 0.0,
    return_resolve: bool = False,
    cyl_window: int | None = None,
):
    """Cold-start megakernel march with IN-KERNEL ray generation.

    ``pos`` [n] int32 pixel indices (any order — the staged renderer's
    block-major layout, a sharded subset's band, ...). Each tile computes
    its own ray directions and bounding-sphere init from the index and the
    [3,4] cam_to_world matrix, so the dense XLA ray-build + init pass (and
    its [N,3]/[1,N]x4 HBM round trips — measured ~3.4 ms at 1080p) never
    runs. Semantics mirror camera.ray_dirs_from_index + march.init_state
    to f32 ulps. Returns a fresh MarchState (steps from 0), plus the
    per-ray resolve step with ``return_resolve=True``.
    """
    weights, biases, n_in, hidden = pack_params(params)
    tile = min(tile, max_tile_for_width(
        hidden, weights.shape[0],
        three_pass=(precision == jax.lax.Precision.HIGH)))
    n = pos.shape[0]
    n_tiles = pl.cdiv(n, tile)
    n_pad = n_tiles * tile
    compose = scenes.compose_fn(
        config.scene,
        config.cyl_window if cyl_window is None else cyl_window,
    )
    if compose is None:
        raise ValueError(
            f"megakernel does not support scene {config.scene!r}; "
            "the XLA march path handles it"
        )
    three_pass = precision == jax.lax.Precision.HIGH
    if three_pass:
        weight_inputs = (*split_hi_lo(weights), biases)
    else:
        weight_inputs = (weights, biases)

    pos_pad = jnp.full((1, n_pad), -1, jnp.int32).at[0, :n].set(
        pos.astype(jnp.int32))

    kernel = functools.partial(
        _march_megakernel,
        n_layers=weights.shape[0],
        hidden=hidden,
        n_inputs=config.num_inputs,
        max_steps=config.max_steps,
        march_eps=config.march_eps if march_eps is None else march_eps,
        compose=compose,
        precision=precision,
        num_steps=None,
        relax_omega=relax_omega,
        three_pass=three_pass,
        track_resolve=return_resolve,
        raygen=(config.width, config.height, config.focal,
                config.bound_center, config.bound_radius),
    )

    row_spec = lambda: pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    t_arr, conv, budget, active, steps_arr = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cam_to_world [3,4]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # frame [1,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),  # steps0 [1,1]
        ] + [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(weight_inputs),
        out_specs=(row_spec(), row_spec(), row_spec(), row_spec(), row_spec()),
        interpret=interpret,
    )(
        pos_pad,
        cam_to_world.astype(jnp.float32),
        jnp.reshape(jnp.asarray(frame, jnp.float32), (1, 1)),
        jnp.zeros((1, 1), jnp.float32),
        *weight_inputs,
    )

    new_steps = jnp.max(steps_arr[0, :n]).astype(jnp.int32)
    out_state = march.MarchState(
        t=t_arr[0, :n],
        budget=budget[0, :n],
        active=active[0, :n] > 0.5,
        converged=conv[0, :n] > 0.5,
        steps=new_steps,
    )
    if return_resolve:
        return out_state, steps_arr[0, :n]
    return out_state


@functools.partial(
    jax.jit, static_argnames=("config", "tile", "interpret")
)
def march_pallas(
    params: MLPParams,
    origin: jax.Array,
    dirs: jax.Array,
    config: RenderConfig,
    frame: jax.Array | float = 0.0,
    *,
    tile: int = 1024,
    interpret: bool = False,
):
    """Run the megakernel over all rays. Returns (t [N], hit [N] bool)."""
    state = march.init_state(origin, dirs, config.bound_center, config.bound_radius)
    out = march_pallas_state(
        params, origin, dirs, state, config, frame, tile=tile, interpret=interpret
    )
    return out.t, out.converged


@functools.partial(jax.jit, static_argnames=("config", "tile", "interpret"))
def render_image_pallas(
    params: MLPParams,
    camera: Camera,
    config: RenderConfig,
    matcap: Optional[jax.Array] = None,
    frame: jax.Array | float = 0.0,
    *,
    tile: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """Full render with the Pallas march + XLA shading epilogue.

    Shading (normals via autodiff/FD, facing or matcap) runs once per pixel
    in XLA — it is not march-rate critical and keeps dynamic gathers out of
    the kernel (SURVEY.md §7 hard-parts note).
    """
    if not scenes.kernel_supported(config.scene):
        raise ValueError(
            f"pallas megakernel does not support scene {config.scene!r}; "
            "use render_image"
        )
    from ..render.renderer import scene_fn

    cam_to_world, world_to_cam = camera_lib.view_matrices(camera)
    origin, dirs = camera_lib.generate_rays(
        cam_to_world, config.height, config.width, config.focal
    )
    t, hit = march_pallas(
        params, origin, dirs, config, frame, tile=tile, interpret=interpret
    )

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
