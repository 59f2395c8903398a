"""Pipelined per-piece decomposition of the 1080p staged frame.

The chained-program protocol (exp_r5_breakdown) proved unreliable — the
compiler elides value-identical links unpredictably. This uses the SAME
protocol the production number comes from: dispatch N independent copies
of one piece back-to-back (distinct cameras, real data), ONE drain sync;
per-piece wall time is then the piece's true pipelined device cost (the
per-dispatch overhead is hidden exactly as in render_sequence).

Pieces: full frame / march only / shade+restore on a fixed bundle /
restore sort alone / coarse megakernel alone. Optional --caps applies
explicit refine caps.
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
from cudaneuralrender_tpu.ops import camera as camera_lib, compaction, march, shading
from cudaneuralrender_tpu.render import renderer


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--n", type=int, default=12)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--caps", default="")
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged",
                           adaptive_rungs=False)
    if args.caps:
        cfg = cfg.replace(refine_caps=tuple(int(c) for c in args.caps.split(",")))
    cams = [cnr.Camera(rotation_y=25.0 + 20.0 * i, rotation_x=10.0)
            for i in range(args.n)]
    views = [camera_lib.view_matrices(c) for c in cams]
    fz = jnp.float32(0.0)

    def timed(name, fns):
        """fns: list of zero-arg dispatchers returning a device array."""
        outs = [f() for f in fns]  # compile+warm
        jax.block_until_ready(outs)
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            outs = [f() for f in fns]
            float(jnp.stack([jnp.sum(o) for o in outs]).sum())
            ts.append((time.perf_counter() - t0) / len(fns))
        print(f"{name:48s}: {min(ts)*1e3:8.2f} ms/frame", flush=True)

    # full production frame
    timed("full _render_scheduled", [
        (lambda c=c: renderer._render_scheduled(params, c, cfg, None, fz)[0])
        for c in cams
    ])

    # march only
    @jax.jit
    def march_only(c2w):
        origin, dirs = camera_lib.generate_rays(c2w, h, w, cfg.focal)
        pr, *_ = renderer._scheduled_march.__wrapped__(
            params, c2w, origin, dirs, cfg, fz)
        return pr.t

    timed("march only", [(lambda v=v: march_only(v[0])) for v in views])

    # coarse megakernel only (truncated ladder)
    cfg_c = cfg.replace(refine_schedule=((4, 1),), refine_caps=())

    @jax.jit
    def coarse_only(c2w):
        origin, dirs = camera_lib.generate_rays(c2w, h, w, cfg_c.focal)
        pr, *_ = renderer._scheduled_march.__wrapped__(
            params, c2w, origin, dirs, cfg_c, fz)
        return pr.t

    timed("coarse (+1-step refine stub)", [
        (lambda v=v: coarse_only(v[0])) for v in views
    ])

    # shade+restore on fixed bundles (one real bundle per camera)
    bundles = []
    for c, (c2w, w2c) in zip(cams, views):
        origin, dirs = camera_lib.generate_rays(c2w, h, w, cfg.focal)
        pr, steps, *_ = renderer._scheduled_march(
            params, c2w, origin, dirs, cfg, fz)
        bundles.append((pr, steps, c2w, w2c, origin))
    jax.block_until_ready([b[0] for b in bundles])
    conv_within = renderer._conv_within(cfg)

    @jax.jit
    def shade_piece(pr, steps, c2w, w2c, origin):
        rgba, _, _ = renderer._shade_packed(
            params, origin, c2w, pr, steps, w2c, cfg, None, fz,
            within=conv_within)
        return rgba

    timed(f"shade+restore (within={conv_within})", [
        (lambda b=b: shade_piece(*b)) for b in bundles
    ])

    # restore sort alone
    payloads = [shading.pack_rgba_u32(jnp.zeros((h * w, 4))) for _ in bundles]

    @jax.jit
    def restore_piece(pos, payload):
        (r,) = compaction.sort_restore_leaves(pos, (payload,))
        return shading.unpack_rgba_u32(r)

    timed("restore sort alone (u32)", [
        (lambda b=b, p=p: restore_piece(b[0].pos, p))
        for b, p in zip(bundles, payloads)
    ])
    return 0


if __name__ == "__main__":
    sys.exit(main())
