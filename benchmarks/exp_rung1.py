"""Rung-1/2 relax A/B: over-relaxation hurt rung 0 (head-on rays at
coarse_eps); rungs 1+ are grazing-dominated where relax should help — but
measure it (it also adds a 2-row loop carry)."""
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
    from cudaneuralrender_tpu.ops import compaction
    pos, t = compaction.sort_pack_leaves(
        near, (pr0.pos, pr0.t), order=resolve)
    lane = jnp.arange(n, dtype=jnp.int32)
    prs = renderer.PackedRays(pos=pos, t=t,
                              active=lane < jnp.sum(near.astype(jnp.int32)),
                              converged=jnp.zeros_like(near))
    cap0 = n // 4
    sub0, dirs0 = renderer._pr_bucket(prs, cap0, stateA.steps, cam_to_world, origin, cfg)

    @functools.partial(jax.jit, static_argnames=("omega",))
    def rung0(sub, dirs_b, omega):
        return megakernel.march_pallas_state(
            params, origin, dirs_b, sub, cfg, 0.0, tile=8192,
            march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
            num_steps=16, relax_omega=omega)

    sub0_out = rung0(sub0, dirs0, 0.0)
    pr1 = renderer._pr_merge(prs, sub0_out)
    cap1 = n // 8

    @jax.jit
    def sort1(pr):
        return renderer._pr_sort(pr, pr.active, within=cap0)

    pr1s = sort1(pr1)
    sub1, dirs1 = renderer._pr_bucket(pr1s, cap1, sub0_out.steps, cam_to_world, origin, cfg)
    float(_sync_val(sub1))

    @functools.partial(jax.jit, static_argnames=("omega", "nsteps"))
    def rung(sub, dirs_b, omega, nsteps):
        return megakernel.march_pallas_state(
            params, origin, dirs_b, sub, cfg, 0.0, tile=8192,
            march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
            num_steps=nsteps, relax_omega=omega)

    for omega in (0.0, 1.4, 1.6, 2.0):
        out = timed(f"rung1 (N/8 x 24) omega={omega}", rung, sub1, dirs1, omega, 24)
        print(f"   -> active after: {int(jnp.sum(out.active))}, "
              f"converged: {int(jnp.sum(out.converged))}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
