"""Exact active-ray decay through the HIGHEST refine phase at 1080p.

Marches the difficulty-sorted refine bucket through the in-kernel rung in
fixed increments, recording the active count after each cumulative step
count, for 3 cameras. This is the sizing data for a finer decay-matched
ladder (the previous sweep, exp_sched3/4, predates the slimmer sorts — the
rung-split overhead has since dropped, so re-derive).
"""
from __future__ import annotations

import os as _os
import sys

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import compaction, march
from cudaneuralrender_tpu.pallas import megakernel
from cudaneuralrender_tpu.pallas.fused_mlp import should_interpret
from cudaneuralrender_tpu.render import renderer

CHECKPOINTS = (4, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                           march_impl="staged")
    fz = jnp.float32(0.0)
    cap = max(n // 4, cfg.compact_min)

    @jax.jit
    def decay_counts(cam_to_world, origin, dirs):
        st = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)
        st, res = megakernel.march_pallas_state(
            params, origin, dirs, st, cfg, fz, tile=8192,
            march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT,
            relax_omega=cfg.relax_omega, interpret=should_interpret(),
            return_resolve=True,
        )
        pr = renderer._pack_init(st, dirs)
        near = pr.active | pr.converged
        pos, t = compaction.sort_pack_leaves(near, (pr.pos, pr.t), order=res)
        lane = jnp.arange(n, dtype=jnp.int32)
        pr = renderer.PackedRays(pos=pos, t=t, active=lane < jnp.sum(near),
                                 converged=jnp.zeros_like(near))
        sub, dirs_b = renderer._pr_bucket(pr, cap, jnp.int32(30), cam_to_world,
                                          origin, cfg)
        counts = [jnp.sum(near.astype(jnp.int32))]
        done = 0
        relax = cfg.relax_omega_refine
        for k in CHECKPOINTS:
            sub = megakernel.march_pallas_state(
                params, origin, dirs_b, sub, cfg, fz, tile=8192,
                march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
                num_steps=k - done, relax_omega=(0.0 if done == 0 else relax),
                interpret=should_interpret(),
            )
            done = k
            counts.append(jnp.sum(sub.active.astype(jnp.int32)))
        return jnp.stack(counts)

    for ry in (25.0, 105.0, 165.0):
        cam = cnr.Camera(rotation_y=ry, rotation_x=10.0)
        cam_to_world, _ = camera_lib.view_matrices(cam)
        origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
        counts = np.asarray(decay_counts(cam_to_world, origin, dirs))
        print(f"ry={ry}: near={counts[0]}", flush=True)
        for k, c in zip(CHECKPOINTS, counts[1:]):
            print(f"  after {k:4d} HIGHEST steps: {c:8d} active "
                  f"({c/n*100:.3f}% of image, 1/div={n/max(c,1):.0f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
