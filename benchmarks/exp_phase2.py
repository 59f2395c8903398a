"""Decompose the current staged 1080p frame (coarse kernel -> refine rungs
-> shade) into per-component wall times with realistic inputs, to target
optimization. Components re-run standalone as tiny jit programs; the sum
should roughly match the ~79 ms end-to-end frame."""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib, march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.render import renderer


@jax.jit
def _sync_val(out):
    # ONE scalar fetch for any pytree (each fetch costs ~26 ms tunnel RTT)
    return jnp.stack(
        [jnp.sum(l).astype(jnp.float32) for l in jax.tree_util.tree_leaves(out)]
    ).sum()


def timed(name, fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    float(_sync_val(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(_sync_val(fn(*args, **kw)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:44s}: {np.min(ts)*1e3:8.2f} ms (median {np.median(ts)*1e3:8.2f})",
          flush=True)
    return out


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, world_to_cam = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)

    # phase A: coarse run-to-dry kernel over the full image
    @jax.jit
    def coarse(o, d):
        st = march.init_state(o, d, cfg.bound_center, cfg.bound_radius)
        return megakernel.march_pallas_state(
            params, o, d, st, cfg, 0.0, tile=8192, march_eps=cfg.coarse_eps,
            precision=jax.lax.Precision.DEFAULT, relax_omega=cfg.relax_omega,
            return_resolve=True)

    stateA, resolve = timed("A: coarse megakernel (run-to-dry)", coarse, origin, dirs)
    pr0 = renderer._pack_init(stateA, dirs)
    near = pr0.converged | pr0.active
    print(f"   near={int(jnp.sum(near))} active={int(jnp.sum(pr0.active))}")

    # refine entry sort (full image, 9 leaves, difficulty key)
    @jax.jit
    def entry_sort(pr):
        pos, t = __import__("cudaneuralrender_tpu.ops.compaction",
                                    fromlist=["x"]).sort_pack_leaves(
            near, (pr.pos, pr.t), order=resolve)
        lane = jnp.arange(n, dtype=jnp.int32)
        return renderer.PackedRays(
            pos=pos, t=t,
            active=lane < jnp.sum(near.astype(jnp.int32)),
            converged=jnp.zeros_like(near))

    prs = timed("B: refine entry sort (2M x 9 leaves)", entry_sort, pr0)

    f = renderer.scene_fn(params, cfg, 0.0)
    rung_kernel = renderer._rung_kernel_fn(params, cfg, 0.0, cfg.relax_omega)
    sched = cfg.refine_schedule
    pr, steps, within = prs, stateA.steps, None

    def make_rung(i, rsteps, cap, within):
        @jax.jit
        def go(pr, steps):
            p = pr if i == 0 else renderer._pr_sort(pr, pr.active, within=within)
            sub, dirs_b = renderer._pr_bucket(p, cap, steps, cam_to_world, origin, cfg)
            sub = rung_kernel(sub, dirs_b, origin, cfg.march_eps,
                              jax.lax.Precision.HIGHEST,
                              (None if rsteps == 0 else rsteps),
                              relax_omega=(0.0 if i == 0 else cfg.relax_omega))
            return renderer._pr_merge(p, sub), sub.steps
        return go

    for i, (div, rsteps) in enumerate(sched):
        cap = max(n // div, cfg.compact_min)
        go = make_rung(i, rsteps, cap, within)
        pr, steps = timed(
            f"C{i}: rung {i} (N/{div} = {cap} x {rsteps or 'dry'})", go, pr, steps)
        within = cap
        print(f"   active after rung {i}: {int(jnp.sum(pr.active))}")

    # shade + restore
    @jax.jit
    def shade(pr, steps):
        return renderer._shade_packed(
            params, origin, cam_to_world, pr, steps, world_to_cam, cfg, None, 0.0,
            within=max(n // sched[0][0], cfg.compact_min))[0]

    timed("D: packed shade + image-order restore", shade, pr, steps)

    # end-to-end reference
    @jax.jit
    def full(camera):
        return renderer._render_scheduled.__wrapped__(
            params, camera, cfg, None, jnp.float32(0.0))[0]

    timed("E: full frame (one program)", full, cam)
    return 0


if __name__ == "__main__":
    sys.exit(main())
