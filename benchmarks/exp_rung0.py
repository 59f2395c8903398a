"""Rung-0 (N/4 x 16 HIGHEST) micro-sweep: over-relaxation on/off x tile
size, driven standalone on a real coarse state (same harness as
exp_phase2). Rung 0 currently marches plain (omega=1) with tile=8192."""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib, march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.render import renderer


@jax.jit
def _sync_val(out):
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
    print(f"{name:40s}: {np.min(ts)*1e3:8.2f} ms (median {np.median(ts)*1e3:8.2f})",
          flush=True)
    return out


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, _ = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)

    @jax.jit
    def coarse(o, d):
        st = march.init_state(o, d, cfg.bound_center, cfg.bound_radius)
        return megakernel.march_pallas_state(
            params, o, d, st, cfg, 0.0, tile=8192, march_eps=cfg.coarse_eps,
            precision=jax.lax.Precision.DEFAULT, relax_omega=cfg.relax_omega,
            return_resolve=True)

    stateA, resolve = coarse(origin, dirs)
    pr0 = renderer._pack_init(stateA, dirs)
    near = pr0.converged | pr0.active
    prs = renderer._pr_sort(
        pr0._replace(active=near, converged=jnp.zeros_like(near)), near,
        order=resolve)
    cap = n // 4
    sub0, dirs0 = renderer._pr_bucket(prs, cap, stateA.steps, cam_to_world, origin, cfg)
    float(_sync_val(sub0))

    @functools.partial(jax.jit, static_argnames=("tile", "omega", "steps16"))
    def rung0(sub, dirs_b, tile, omega, steps16):
        return megakernel.march_pallas_state(
            params, origin, dirs_b, sub, cfg, 0.0, tile=tile,
            march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
            num_steps=steps16, relax_omega=omega)

    base_active = None
    for tile in (4096, 8192, 16384):
        for omega in (0.0, 1.6):
            out = timed(f"rung0 tile={tile:5d} omega={omega}", rung0,
                        sub0, dirs0, tile, omega, 16)
            act = int(jnp.sum(out.active))
            hits = int(jnp.sum(out.converged))
            print(f"   -> active after: {act}, converged: {hits}", flush=True)
    # relax with a shorter bound (relax covers more ground per step)
    for steps in (10, 12):
        out = timed(f"rung0 tile=8192 omega=1.6 steps={steps}", rung0,
                    sub0, dirs0, 8192, 1.6, steps)
        print(f"   -> active after: {int(jnp.sum(out.active))}, "
              f"converged: {int(jnp.sum(out.converged))}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
