"""Active-ray decay within the refine phase (HIGHEST steps from the coarse
near set) — data for tuning refine_schedule rung sizes."""
from __future__ import annotations

import sys

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib, march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.render import renderer


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    for ry in (25.0, 65.0):
        cam = cnr.Camera(rotation_y=ry, rotation_x=10.0)
        cam_to_world, _ = camera_lib.view_matrices(cam)
        origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
        state0 = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)
        stateA = megakernel.march_pallas_state(
            params, origin, dirs, state0, cfg, 0.0, tile=8192,
            march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT,
            relax_omega=cfg.relax_omega)
        pr = renderer._pack_init(stateA, dirs)
        near = pr.converged | pr.active
        prs = renderer._pr_sort(
            pr._replace(active=near, converged=jnp.zeros_like(near)), near)
        sub, dirs_b = renderer._pr_bucket(prs, n // 4, stateA.steps, cam_to_world, origin, cfg)
        print(f"ry={ry}: near={int(jnp.sum(near))}", flush=True)
        st = sub
        total = 0
        for chunk in (4, 4, 8, 8, 8, 16, 16, 32, 40, 64, 128, 256, 512):
            st = megakernel.march_pallas_state(
                params, origin, dirs_b, st, cfg, 0.0, tile=8192,
                march_eps=cfg.march_eps,
                precision=jax.lax.Precision.HIGHEST, num_steps=chunk)
            total += chunk
            print(f"  after {total:4d} HIGHEST steps: active="
                  f"{int(jnp.sum(st.active))}", flush=True)
            if int(jnp.sum(st.active)) == 0:
                break
    return 0


if __name__ == "__main__":
    sys.exit(main())
