"""Stage-by-stage decomposition of the CURRENT scheduled march (with the
coarse + refine megakernels) on real 1080p state, in-jit looped.

Builds each stage's true input state once, then times the stage with fresh
(salted) state per iteration so convergence behavior is the real one.
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
    t = np.min(ts) / K
    print(f"{name:56s}: {t*1e3:8.3f} ms", flush=True)
    return t


def loop_state(body, s, *args):
    """Run body(s) K times with a data-dependent salt, real state each time."""
    @jax.jit
    def f(s, *a):
        def step(salt, _):
            st = s._replace(t=s.t + salt)
            out = body(st, *a)
            return jnp.min(out.t) * 1e-12, None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
        return out
    return lambda: f(s, *args)


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, _ = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
    frame = jnp.float32(0.0)

    # --- stage A: coarse megakernel over the full image
    state0 = march.init_state(origin, dirs, cfg.bound_center, cfg.bound_radius)
    timed("A coarse megakernel (2M, run to dry)", loop_state(
        lambda st: megakernel.march_pallas_state(
            params, origin, dirs, st, cfg, 0.0, tile=8192,
            march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT),
        state0))

    stateA = megakernel.march_pallas_state(
        params, origin, dirs, state0, cfg, 0.0, tile=8192,
        march_eps=cfg.coarse_eps, precision=jax.lax.Precision.DEFAULT)
    pr = renderer._pack_init(stateA, dirs)
    near = pr.converged | pr.active
    print(f"after coarse: active={int(jnp.sum(stateA.active))} "
          f"conv={int(jnp.sum(stateA.converged))} near={int(jnp.sum(near))}")

    # --- stage B: the refine phase's full-bundle near sort (8 leaves, 2M)
    prn = pr._replace(active=near, converged=jnp.zeros_like(near))

    @jax.jit
    def sortK(p):
        def step(salt, _):
            out = renderer._pr_sort(p._replace(t=p.t + salt), p.active)
            return jnp.min(out.t) * 1e-12, None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
        return out
    timed("B near sort (8-leaf, 2M)", lambda: sortK(prn))

    prs = renderer._pr_sort(prn, prn.active)
    cap0 = n // 4
    sub0, dirs0 = renderer._pr_bucket(prs, cap0, stateA.steps, cam_to_world, origin, cfg)

    # --- stage C: rung0 kernel (32 HIGHEST steps, real convergence)
    timed(f"C rung0 kernel 32 HIGHEST steps ({cap0})", loop_state(
        lambda st, d: megakernel.march_pallas_state(
            params, origin, d, st, cfg, 0.0, tile=8192,
            march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
            num_steps=32),
        sub0, dirs0))

    subC = megakernel.march_pallas_state(
        params, origin, dirs0, sub0, cfg, 0.0, tile=8192,
        march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
        num_steps=32)
    prC = renderer._pr_merge(prs, subC)
    print(f"after rung0: active={int(jnp.sum(prC.active))}")

    # --- stage D: rung1 (sort within cap0 + 96 HIGHEST steps on N/32)
    cap1 = n // 32
    prD = renderer._pr_sort(prC, prC.active, within=cap0)
    sub1, dirs1 = renderer._pr_bucket(prD, cap1, subC.steps, cam_to_world, origin, cfg)

    @jax.jit
    def sortD(p):
        def step(salt, _):
            out = renderer._pr_sort(p._replace(t=p.t + salt), p.active, within=cap0)
            return jnp.min(out.t) * 1e-12, None
        out, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=K)
        return out
    timed(f"D rung1 sort (within {cap0})", lambda: sortD(prC))
    timed(f"D rung1 kernel 96 HIGHEST steps ({cap1})", loop_state(
        lambda st, d: megakernel.march_pallas_state(
            params, origin, d, st, cfg, 0.0, tile=8192,
            march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
            num_steps=96),
        sub1, dirs1))

    subD = megakernel.march_pallas_state(
        params, origin, dirs1, sub1, cfg, 0.0, tile=8192,
        march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
        num_steps=96)
    prE = renderer._pr_merge(prD, subD)
    print(f"after rung1: active={int(jnp.sum(prE.active))}")

    # --- stage E: terminal rung (sort within cap1 + run-to-dry on N/256)
    cap2 = max(n // 256, cfg.compact_min)
    prF = renderer._pr_sort(prE, prE.active, within=cap1)
    sub2, dirs2 = renderer._pr_bucket(prF, cap2, subD.steps, cam_to_world, origin, cfg)
    timed(f"E terminal kernel run-to-dry ({cap2})", loop_state(
        lambda st, d: megakernel.march_pallas_state(
            params, origin, d, st, cfg, 0.0, tile=8192,
            march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
            relax_omega=cfg.relax_omega),
        sub2, dirs2))

    subF = megakernel.march_pallas_state(
        params, origin, dirs2, sub2, cfg, 0.0, tile=8192,
        march_eps=cfg.march_eps, precision=jax.lax.Precision.HIGHEST,
        relax_omega=cfg.relax_omega)
    print(f"after terminal: active={int(jnp.sum(subF.active))} "
          f"steps={int(subF.steps)}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
