"""In-jit looped costs of the packed-shading constituents (sorts, normals).

Single-shot timings over the tunnel carry a ~26 ms RTT floor and XLA's
SortSimplifier can silently drop unused sort operands (so a jit that returns
only rgba measures a *cheaper* restore than the real program pays). Loops
force every operand live.
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
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import compaction, shading
from cudaneuralrender_tpu.render import renderer

K = 16


def timed(name, fn, *args, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = np.min(ts)
    print(f"{name:52s}: {t/K*1e3:8.3f} ms/iter  (loop {t*1e3:8.1f} ms)", flush=True)


def main():
    w, h = 1920, 1080
    n = w * h
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, world_to_cam = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
    pr, steps, _, _, _ = renderer._scheduled_march(
        params, origin, dirs, cfg, jnp.float32(0.0))
    pr = jax.block_until_ready(pr)
    cap = max(n // cfg.shade_div, cfg.compact_min)

    def loop(body):
        @jax.jit
        def f(p):
            def step(carry, _):
                out = body(carry[0])
                # keep every leaf live: fold a scalar of each into the mask
                salt = sum(jnp.sum(x[:64].astype(jnp.float32)) for x in out)
                return (carry[0]._replace(t=carry[0].t + 0.0 * salt), out), None
            (c, out), _ = jax.lax.scan(step, (p, body(p)), None, length=K)
            return out
        return f

    # pack sort keyed on converged: full-width vs within the refine bucket
    pack_full = loop(lambda p: tuple(renderer._pr_sort(p, p.converged, within=None)))
    timed("pack sort 8-leaf (within=None, 2M)", pack_full, pr)
    within = max(n // cfg.refine_schedule[0][0], cfg.compact_min)
    pack_win = loop(lambda p: tuple(renderer._pr_sort(p, p.converged, within=within)))
    timed(f"pack sort 8-leaf (within={within})", pack_win, pr)

    # restore sorts at 2M: 9-operand (full state + rgba) vs 5-operand (rgba)
    colors = jnp.zeros((n, 4), jnp.float32)

    def rest8(p):
        return compaction.sort_restore_leaves(
            p.pos, (p.t, p.budget, p.active, p.converged,
                    colors[:, 0], colors[:, 1], colors[:, 2], colors[:, 3]))

    def rest4(p):
        return compaction.sort_restore_leaves(
            p.pos, (colors[:, 0], colors[:, 1], colors[:, 2], colors[:, 3]))

    timed("restore sort 8 payloads (2M)", loop(rest8), pr)
    timed("restore sort 4 payloads (2M)", loop(rest4), pr)

    # normals on the shade bucket
    prs = renderer._pr_sort(pr, pr.converged, within=None)
    sub, sub_dirs = renderer._pr_bucket(prs, cap, steps)
    pts = jax.block_until_ready(origin + sub_dirs * sub.t[:, None])
    f_sh = renderer.shade_fn(params, cfg, jnp.float32(0.0))

    @jax.jit
    def nloop(p):
        def step(x, _):
            nrm = shading.autodiff_normals(f_sh, x)
            return x + 1e-9 * nrm, None
        out, _ = jax.lax.scan(step, p, None, length=K)
        return out

    timed(f"autodiff normals ({cap})", nloop, pts)
    return 0


if __name__ == "__main__":
    sys.exit(main())
