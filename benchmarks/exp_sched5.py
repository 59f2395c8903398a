"""Refine-ladder re-sweep after the sort slimming (exp_decay3 sizing data).

The shipped ladder D=((4,16),(8,24),(32,64),(256,0)) schedules ~18.7M
HIGHEST lane-steps at 1080p where ~7M are useful (37%). exp_sched4 found
finer ladders neutral, but that predates three sort-cost reductions
(rgba/u32, slimmed payloads, dropped budget). Candidates sized from
exp_decay3's measured worst-case actives at each cumulative step count,
entry margins >= 1.35x; intermediate-rung overflow means a slow-path frame,
so margins are the safety knob.
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr

CANDIDATES = {
    "D base ((4,16),(8,24),(32,64),(256,0))": ((4, 16), (8, 24), (32, 64), (256, 0)),
    "A ((4,12),(8,12),(16,24),(128,0))": ((4, 12), (8, 12), (16, 24), (128, 0)),
    "B ((4,12),(8,16),(16,24),(128,0))": ((4, 12), (8, 16), (16, 24), (128, 0)),
    "F ((4,12),(8,12),(16,24),(96,0))": ((4, 12), (8, 12), (16, 24), (96, 0)),
}


def main():
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cams = [cnr.Camera(rotation_y=25.0 + 45 * i, rotation_x=10.0) for i in range(4)]
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    ref_hits = None
    for name, sched in CANDIDATES.items():
        cfg = base.replace(refine_schedule=sched)
        stats = []
        imgs = cnr.render_sequence(params, cams, cfg, stats_out=stats)
        sync(imgs)
        slow = sum(0 if s["fast_path"] else 1 for s in stats)
        hits = np.asarray(jnp.stack([jnp.sum(im[..., 3] > 0) for im in imgs]))
        if ref_hits is None:
            ref_hits = hits
        agree = 1.0 - np.abs(hits - ref_hits).sum() / max(ref_hits.sum(), 1)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            sync(cnr.render_sequence(params, cams, cfg))
            times.append((time.perf_counter() - t0) / len(cams))
        ms = np.min(times) * 1e3
        print(f"{name:44s}: {ms:8.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s"
              f"  hit-agree={agree:.6f} slow-frames={slow}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
