"""Decompose the packed-shading stage (sorts vs normals vs color) on TPU.

The profile (profile_march.py) shows packed shading + restore at ~49 ms of a
~157 ms 1080p frame — co-dominant with the refine march. This experiment
times each constituent independently to find where the time actually goes.
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


def timed(name, fn, *args, reps=5):
    r = fn(*args)
    jax.block_until_ready(r)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{name:46s}: {np.median(ts)*1e3:8.2f} ms (min {np.min(ts)*1e3:8.2f})",
          flush=True)
    return np.median(ts)


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
    print(f"n={n} shade_cap={cap} hits={int(jnp.sum(pr.converged))}")

    # (1) the hit-mask pack sort over the full bundle (8 leaves)
    sort8 = jax.jit(lambda p: renderer._pr_sort(p, p.converged, within=None))
    timed("pack sort (8 leaves, 2M)", sort8, pr)

    # (2) shade computation alone on the packed bucket
    prs = sort8(pr)
    sub, sub_dirs = renderer._pr_bucket(prs, cap, steps)
    pts = origin + sub_dirs * sub.t[:, None]
    f = renderer.shade_fn(params, cfg, jnp.float32(0.0))

    sh = jax.jit(lambda p, d: shading.shade(
        f, p, d, mode=cfg.shading, normal_mode=cfg.normal_mode,
        normal_eps=cfg.normal_eps, world_to_cam=world_to_cam, matcap=None))
    timed(f"shade bucket ({cap})", sh, pts, sub_dirs)

    nrm = jax.jit(lambda p: shading.autodiff_normals(f, p))
    timed(f"autodiff normals ({cap})", nrm, pts)
    tet = jax.jit(lambda p: shading.tetrahedron_normals(f, p, cfg.normal_eps))
    timed(f"tetrahedron normals ({cap})", tet, pts)

    fwd = jax.jit(f)
    timed(f"sdf forward ({cap})", fwd, pts)

    # (3) the final restore sort (pos key + 8 payloads)
    colors = sh(pts, sub_dirs)
    colors_full = jnp.concatenate(
        [colors, jnp.zeros((n - cap, 4), jnp.float32)], axis=0)
    rest = jax.jit(lambda p, c: compaction.sort_restore_leaves(
        p.pos, (p.t, p.budget, p.active, p.converged,
                c[:, 0], c[:, 1], c[:, 2], c[:, 3])))
    timed("restore sort (pos key, 8 payloads)", rest, prs, colors_full)

    # restore rgba only (4 payloads)
    rest4 = jax.jit(lambda p, c: compaction.sort_restore_leaves(
        p.pos, (c[:, 0], c[:, 1], c[:, 2], c[:, 3])))
    timed("restore sort (pos key, 4 payloads)", rest4, prs, colors_full)

    # (4) whole packed-shade stage for reference
    shade_all = jax.jit(lambda p, s: renderer._shade_packed(
        params, origin, p, s, world_to_cam, cfg, None, jnp.float32(0.0))[0])
    timed("_shade_packed end-to-end", shade_all, pr, steps)
    return 0


if __name__ == "__main__":
    sys.exit(main())
