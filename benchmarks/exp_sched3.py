"""Refine-ladder schedule sweep at 1080p, driven by the measured active-ray
decay (benchmarks/exp_decay.py, plane_1 ry=25/65):

    steps:  4     8     16    24    32    48    64    96    136   200
    active: 325k  300k  166k  93k   54k   21k   13k   2.8k  1.0k  0.3k

The bulk of the near set (N/4 bucket, ~330k rays) converges between steps
16 and 64, so rungs should shrink the bucket right there rather than hold
N/4 for 32 steps. Timing protocol = bench.py (pipelined render_sequence,
median per-frame over 3 cameras, best of 2 passes).
"""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr

CANDIDATES = {
    "A cur ((4,32),(32,96),(256,0))": ((4, 32), (32, 96), (256, 0)),
    "B 5rung 16/16/16/64": ((4, 16), (8, 16), (16, 16), (64, 64), (256, 0)),
    "C 4rung 16/16/64": ((4, 16), (8, 16), (32, 64), (256, 0)),
    "D 4rung 16/24/64": ((4, 16), (8, 24), (32, 64), (256, 0)),
    "F 4rung 16/16/32 tail128": ((4, 16), (8, 16), (16, 32), (128, 0)),
}


def main():
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cams = [cnr.Camera(rotation_y=25.0 + 20 * i, rotation_x=10.0) for i in range(3)]
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    ref_hits = None
    for name, sched in CANDIDATES.items():
        cfg = base.replace(refine_schedule=sched)
        imgs = cnr.render_sequence(params, cams, cfg)
        sync(imgs)  # compile + warm
        # scalar-only parity probe (full images are ~100MB over the tunnel)
        hits = np.asarray(
            jnp.stack([jnp.sum(im[..., 3] > 0) for im in imgs])
        )
        if ref_hits is None:
            ref_hits = hits
        agree = 1.0 - np.abs(hits - ref_hits).sum() / max(ref_hits.sum(), 1)
        times = []
        for _ in range(2):
            t0 = time.perf_counter()
            sync(cnr.render_sequence(params, cams, cfg))
            times.append((time.perf_counter() - t0) / len(cams))
        ms = np.min(times) * 1e3
        print(f"{name:34s}: {ms:8.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s"
              f"  hit-agree={agree:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
