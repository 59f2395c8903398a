"""Decompose the staged 1080p march phase-by-phase (steps consumed, active
counts, wall time per phase) on the packed (sort-compaction) architecture,
and probe config variants. Reaches into renderer internals by design (like
profile_march.py); the shipped defaults are set from this data.
"""
from __future__ import annotations

import functools
import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import march
from cudaneuralrender_tpu.render import renderer


@functools.partial(jax.jit, static_argnames=("config", "upto"))
def march_upto(params, origin, dirs, config, frame, upto: int):
    """Replicates _scheduled_march's phase structure, stopping after `upto`
    refine rungs (-1 = phase A only). Returns (steps, active, conv, near)."""
    fine = renderer.scene_fn(params, config, frame)
    coarse = renderer.scene_fn(params, config, frame,
                               precision=jax.lax.Precision.DEFAULT)
    relax = config.relax_omega
    state = march.init_state(origin, dirs, config.bound_center, config.bound_radius)
    state = march.march_stage(coarse, origin, dirs, state,
                              num_steps=config.stage_steps,
                              max_steps=config.max_steps,
                              march_eps=config.coarse_eps, relax_omega=relax)
    pr, steps = renderer._pack_init(state, dirs), state.steps
    pr, steps, within = renderer._run_schedule(
        coarse, origin, pr, steps, config.coarse_schedule, config,
        config.coarse_eps, relax=relax, within=None)
    if upto >= 0:
        sched = config.refine_schedule[: upto + 1]
        cfg2 = config.replace(refine_schedule=sched)
        pr, steps, within, _ = renderer._refine_phase(
            fine, origin, pr, steps, cfg2, config.march_eps,
            precision=jax.lax.Precision.HIGHEST, tail_kernel=None, relax=relax)
    near = pr.converged | pr.active
    return jnp.stack([steps,
                      jnp.sum(pr.active.astype(jnp.int32)),
                      jnp.sum(pr.converged.astype(jnp.int32)),
                      jnp.sum(near.astype(jnp.int32))])


def timed_stats(name, fn, *args, reps=3):
    stats = np.asarray(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:36s}: {np.median(ts)*1e3:8.2f} ms  steps={stats[0]:5d} "
          f"active={stats[1]:7d} conv={stats[2]:7d} near={stats[3]:7d}", flush=True)


def main():
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged", relax_omega=1.6)
    c2w, _ = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(c2w, h, w, base.focal)
    fr = jnp.float32(0.0)

    for om in (0.0, 1.6):
        cfg = base.replace(relax_omega=om)
        print(f"--- omega={om}", flush=True)
        timed_stats("phase A (coarse)", march_upto, params, origin, dirs, cfg, fr, -1)
        for k in range(len(cfg.refine_schedule)):
            timed_stats(f"+ refine rung {k} {cfg.refine_schedule[k]}",
                        march_upto, params, origin, dirs, cfg, fr, k)
    return 0


if __name__ == "__main__":
    sys.exit(main())
