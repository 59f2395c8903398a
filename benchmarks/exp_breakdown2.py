"""Marginal in-context cost of each staged-march piece via config ablation.

*** PROTOCOL SUPERSEDED (round 5): chained identical programs are
*** unreliable — the compiler elides value-identical links unpredictably
*** (K=2 and K=8 chains of the same program disagreed 8x in
*** exp_r5_verify.py despite correct per-link outputs). Use the pipelined
*** per-piece protocol of exp_r5_pieces.py for numbers of record.

Chains the REAL _scheduled_march K times in one program (defeating the
tunnel RTT) under truncated refine schedules / toggled knobs; successive
differences give each rung's true marginal cost including its sort and the
actives it inherits. Truncated schedules leave survivors unconverged —
fine for timing (no host continuation runs inside the chained program).
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
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    cam_to_world, _ = camera_lib.view_matrices(cam)
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

    def timed(name, cfg):
        def body(o, d):
            return renderer._scheduled_march.__wrapped__(
                params, cam_to_world, o, d, cfg, fz)[0].t

        @jax.jit
        def run(o, d):
            out = body(o, d)
            for _ in range(K - 1):
                out = body(o + jnp.sum(out) * 1e-30, d)
            return out

        float(jnp.sum(run(origin, dirs)))
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(jnp.sum(run(origin, dirs)))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts))
        per = max(med - rtt, 0.0) / K
        print(f"{name:52s}: ~{per*1e3:7.2f} ms device/run", flush=True)
        return per

    sched = base.refine_schedule
    timed("coarse only (empty refine schedule)", base.replace(refine_schedule=((4, 1),)))
    for k in range(1, len(sched) + 1):
        timed(f"coarse + rungs[:{k}] = {sched[:k]}", base.replace(refine_schedule=sched[:k]))
    timed("full, ordered_packing=False", base.replace(ordered_packing=False))
    timed("full, refine_pallas=False (XLA rungs)", base.replace(refine_pallas=False))
    timed("full, coarse_pallas=False (XLA coarse)", base.replace(coarse_pallas=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
