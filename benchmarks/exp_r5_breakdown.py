"""Round-5 full-frame device-time breakdown, incl. shade + restore stages.

*** PROTOCOL SUPERSEDED: this script's chained-identical-program timing
*** proved unreliable the same day it was written (compiler elision —
*** see exp_r5_verify.py: K=2 and K=8 chains of one program disagree
*** 8x). Kept as the record of that discovery; numbers of record come
*** from exp_r5_pieces.py (pipelined per-piece protocol).

exp_breakdown2 ablates the MARCH only; the round-4 verdict's remaining
gap (measured ~46 ms vs 37.7 ms roofline at 1080p) needs the whole frame
decomposed: ray build + init, coarse kernel, refine ladder, the shade
prefix, and the image-order restore sort — each timed by chaining the
REAL code K times inside one program (defeating the ~26 ms tunnel RTT;
a tiny data dependency threaded through the last input of each call
prevents XLA from CSE-merging the identical chain links), with or
without explicit adaptive rung caps (renderer.tune_caps).

Usage: python benchmarks/exp_r5_breakdown.py [--res 1920x1080] [--caps a,b,c,d]
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
from cudaneuralrender_tpu.render import renderer

K = 8


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--caps", default="",
                    help="comma-separated refine_caps to apply (empty = none)")
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                            max_steps=6000, march_impl="staged",
                            adaptive_rungs=False)
    if args.caps:
        base = base.replace(
            refine_caps=tuple(int(c) for c in args.caps.split(",")))
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, world_to_cam = camera_lib.view_matrices(cam)
    origin, dirs = camera_lib.generate_rays(cam_to_world, h, w, base.focal)
    fz = jnp.float32(0.0)

    noop = jax.jit(lambda x: x + 1.0)
    noop(fz)
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        float(jnp.sum(noop(fz)))
        ts.append(time.perf_counter() - t0)
    rtt = float(np.median(ts))
    print(f"tunnel RTT ~ {rtt*1e3:.2f} ms   (chain K={K})", flush=True)

    def chain_timed(name, body, *inputs):
        """body(*inputs) -> array, chained K times; the previous output
        perturbs the LAST input by +sum(out)*1e-30 so links can't CSE."""

        @jax.jit
        def run(*ins):
            out = body(*ins)
            for _ in range(K - 1):
                acc = jnp.sum(out).astype(ins[-1].dtype) * 1e-30
                out = body(*ins[:-1], ins[-1] + acc)
            return out

        float(jnp.sum(run(*inputs)))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(run(*inputs)))
            ts.append(time.perf_counter() - t0)
        per = max(float(np.median(ts)) - rtt, 0.0) / K
        print(f"{name:56s}: ~{per*1e3:7.2f} ms device/run", flush=True)
        return per

    cfg = base
    conv_within = renderer._conv_within(cfg)

    # 0) whole frame: march + packed shade + restore (the product fast path)
    def full(o, d):
        pr, steps, _w, _ovf, _r = renderer._scheduled_march.__wrapped__(
            params, cam_to_world, o, d, cfg, fz)
        rgba, _, _ = renderer._shade_packed(
            params, o, cam_to_world, pr, steps, world_to_cam, cfg, None, fz,
            within=conv_within)
        return rgba

    chain_timed("FULL march+shade+restore", full, origin, dirs)

    # 1) march only
    def march_only(o, d):
        return renderer._scheduled_march.__wrapped__(
            params, cam_to_world, o, d, cfg, fz)[0].t

    chain_timed("march only (_scheduled_march)", march_only, origin, dirs)

    # 2) ray build + init state only
    from cudaneuralrender_tpu.ops import march as march_lib

    def raygen(o):
        d = camera_lib.generate_rays(cam_to_world, h, w, cfg.focal)[1]
        d = d + o[:1] * 1e-30
        st = march_lib.init_state(o, d, cfg.bound_center, cfg.bound_radius)
        return st.t + st.budget

    chain_timed("ray build + init_state (dense XLA)", raygen, origin)

    # 3) coarse phase only (1-step refine stub, no caps)
    cfg_c = cfg.replace(refine_schedule=((4, 1),), refine_caps=())

    def coarse_only(o, d):
        return renderer._scheduled_march.__wrapped__(
            params, cam_to_world, o, d, cfg_c, fz)[0].t

    chain_timed("coarse phase (+1-step refine stub)", coarse_only, origin, dirs)

    # 4) shade + restore on a fixed marched bundle
    pr0, steps0, _w0, _ovf0, _r0 = renderer._scheduled_march(
        params, cam_to_world, origin, dirs, cfg, fz)
    pr0 = jax.block_until_ready(pr0)

    def shade_only(t):
        p2 = pr0._replace(t=t)
        rgba, _, _ = renderer._shade_packed(
            params, origin, cam_to_world, p2, steps0, world_to_cam, cfg,
            None, fz, within=conv_within)
        return rgba

    chain_timed(f"shade+restore on fixed bundle (within={conv_within})",
                shade_only, pr0.t)

    # 5) restore sort alone (u32 payload over the full bundle)
    from cudaneuralrender_tpu.ops import compaction, shading

    payload = shading.pack_rgba_u32(jnp.zeros((pr0.pos.shape[0], 4)))

    def restore_only(t):
        key = pr0.pos + (t[:1] * 1e-30).astype(jnp.int32)[0]
        (r,) = compaction.sort_restore_leaves(key, (payload,))
        return shading.unpack_rgba_u32(r)

    chain_timed("restore sort alone (u32 payload, full bundle)",
                restore_only, pr0.t)
    return 0


if __name__ == "__main__":
    sys.exit(main())
