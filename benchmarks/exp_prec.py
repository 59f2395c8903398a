"""In-kernel march step cost by matmul precision (rung0-scale workload).

The refine ladder runs ~32 HIGHEST steps on a 518k-ray bucket — the frame's
hottest block. If HIGHEST (6-pass bf16 emulation) costs much more than 6x a
DEFAULT pass in-kernel, a hand-rolled 3-pass (HIGH-equivalent, abs err
~2e-4, enough for eps 1e-3) prelude can cut most of that cost.
"""
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

K = 8


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = np.min(ts)
    print(f"{name:52s}: {t/K*1e3:8.3f} ms/call  (loop {t*1e3:8.1f} ms)", flush=True)
    return t / K


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, _ = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)

    # Build the real rung0 bucket: coarse phase + near-set sort.
    pr, steps, _, _, _ = renderer._scheduled_march(
        params, origin, dirs, cfg, jnp.float32(0.0))
    near = pr.converged | pr.active
    prs = renderer._pr_sort(
        pr._replace(active=near, converged=jnp.zeros_like(near)), near)
    cap = max(n // cfg.refine_schedule[0][0], cfg.compact_min)
    sub, sub_dirs = renderer._pr_bucket(prs, cap, steps)
    sub = jax.block_until_ready(sub)
    print(f"bucket={cap} near={int(jnp.sum(near))}")

    def rung(precision, num_steps, eps):
        @jax.jit
        def f(s, d):
            def body(salt, _):
                # Fresh full-work state every iteration: eps far below any
                # reachable distance => nothing converges, every ray runs all
                # num_steps; huge budget => nothing misses. salt keeps the
                # iterations data-dependent so XLA can't CSE them.
                st = s._replace(
                    t=s.t + salt,
                    budget=jnp.full_like(s.budget, 1e9),
                    active=jnp.ones_like(s.active),
                    converged=jnp.zeros_like(s.converged),
                )
                out = megakernel.march_pallas_state(
                    params, origin, d, st, cfg, 0.0,
                    tile=8192, march_eps=eps,
                    precision=precision, num_steps=num_steps)
                return jnp.min(out.t) * 1e-12, None
            out, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=K)
            return out
        return f

    for prec, name in ((jax.lax.Precision.DEFAULT, "DEFAULT"),
                       (jax.lax.Precision.HIGHEST, "HIGHEST")):
        t = timed(f"rung 32 steps {name} ({cap} rays, no conv)",
                  rung(prec, 32, 1e-12), sub, sub_dirs)
        print(f"  -> {t / 32 / cap * 1e9:.3f} ns/ray-step", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
