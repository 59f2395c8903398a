"""Chained (RTT-proof) decomposition of the packed shading stage at 1080p.

_shade_packed measured ~13.3 ms device (exp_breakdown2) — where? Pieces:
hit-pack sort, ray-dir recompute, autodiff-vs-FD normals at each precision,
color, full-image restore sort, and a scatter-restore alternative.
"""
from __future__ import annotations

import argparse
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.ops import camera as camera_lib
from cudaneuralrender_tpu.ops import compaction, shading
from cudaneuralrender_tpu.render import renderer

K = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))
    n = w * h

    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                           march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, world_to_cam = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)
    fz = jnp.float32(0.0)
    cap = max(n // cfg.shade_div, cfg.compact_min)
    cap0 = max(n // cfg.refine_schedule[0][0], cfg.compact_min)

    pr, steps, _, _, _ = renderer._scheduled_march(params, cam_to_world, origin, dirs, cfg, fz)
    pr = jax.tree_util.tree_map(lambda x: np.asarray(x), pr)
    pr = renderer.PackedRays(*(jnp.asarray(x) for x in pr))

    noop = jax.jit(lambda x: x + 1.0)
    noop(fz)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(jnp.sum(noop(fz)))
        ts.append(time.perf_counter() - t0)
    rtt = float(np.median(ts))
    print(f"tunnel RTT ~ {rtt*1e3:.2f} ms  (K={K}, hit bucket cap={cap})", flush=True)

    def timed(name, body, *args):
        @jax.jit
        def run(*a):
            out = body(*a)
            for _ in range(K - 1):
                out = body(*(x + jnp.sum(out) * 1e-30 if x.dtype == jnp.float32 else x
                             for x in a))
            return out

        float(jnp.sum(run(*args)))
        ts = []
        for _ in range(args_reps):
            t0 = time.perf_counter()
            float(jnp.sum(run(*args)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        print(f"{name:50s}: ~{max(med-rtt,0)/K*1e3:7.2f} ms device/run", flush=True)

    args_reps = args.reps

    def pack_only(t, conv):
        pos_sh, t_sh, conv_sh = compaction.sort_pack_leaves(
            conv > 0.5, (pr.pos, t, conv), within=cap0)
        return t_sh[:cap] + conv_sh[:cap]

    timed("hit-pack sort (within rung0 bucket)", pack_only,
          pr.t, pr.converged.astype(jnp.float32))

    def shade_bucket(normal_mode, prec_name):
        c2 = cfg.replace(normal_mode=normal_mode, shade_precision=prec_name)
        f = renderer.shade_fn(params, c2, fz)

        def body(t, conv):
            pos_sh, t_sh, conv_sh = compaction.sort_pack_leaves(
                conv > 0.5, (pr.pos, t, conv), within=cap0)
            sub_dirs = camera_lib.ray_dirs_from_index(
                cam_to_world, pos_sh[:cap], h, w, cfg.focal)
            points = origin + sub_dirs * t_sh[:cap, None]
            colors = shading.shade(
                f, points, sub_dirs, mode=c2.shading,
                normal_mode=c2.normal_mode, normal_eps=c2.normal_eps,
                world_to_cam=world_to_cam, matcap=None)
            return jnp.where(conv_sh[:cap, None] > 0.5, colors, 0.0)
        return body

    for nm in ("autodiff", "tetrahedron"):
        for prec in ("highest", "default"):
            timed(f"pack + shade bucket ({nm}, {prec})",
                  shade_bucket(nm, prec), pr.t, pr.converged.astype(jnp.float32))

    def full_shade(name, config, within):
        def body(t, conv):
            rgba, _, _ = renderer._shade_packed(
                params, origin, cam_to_world, pr._replace(t=t, converged=conv > 0.5),
                steps, world_to_cam, config, None, fz, within=within)
            return rgba.ravel()[:n]
        timed(name, body, pr.t, pr.converged.astype(jnp.float32))

    full_shade("shade: in-place + u32 restore (default)", cfg, cap0)
    full_shade("shade: in-place + f32x4 restore",
               cfg.replace(rgba_packed=False), cap0)
    full_shade("shade: hit-pack sort + u32 restore", cfg, None)
    full_shade("shade: hit-pack sort + f32x4 restore (old)",
               cfg.replace(rgba_packed=False), None)

    body_sh = shade_bucket(cfg.normal_mode, cfg.shade_precision)

    def scatter_restore(t, conv):
        pos_sh, t_sh, conv_sh = compaction.sort_pack_leaves(
            conv > 0.5, (pr.pos, t, conv), within=cap0)
        sub_dirs = camera_lib.ray_dirs_from_index(
            cam_to_world, pos_sh[:cap], h, w, cfg.focal)
        points = origin + sub_dirs * t_sh[:cap, None]
        f = renderer.shade_fn(params, cfg, fz)
        colors = shading.shade(
            f, points, sub_dirs, mode=cfg.shading, normal_mode=cfg.normal_mode,
            normal_eps=cfg.normal_eps, world_to_cam=world_to_cam, matcap=None)
        colors = jnp.where(conv_sh[:cap, None] > 0.5, colors, 0.0)
        img = jnp.zeros((n, 4), jnp.float32).at[pos_sh[:cap]].set(colors, mode="drop")
        return img.ravel()[:n]

    timed("pack + shade + SCATTER restore (cap rows)", scatter_restore,
          pr.t, pr.converged.astype(jnp.float32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
