"""Per-scene speed-of-light: are the CSG demo scenes near THEIR rooflines?

The bench suite tracks each scene's rays/s but judges saturation only for
neural_raw. A CSG scene differs from neural_raw in BOTH terms of the
roofline product: its in-kernel compose raises the per-lane-step floor
(priced by measure_chain_rate(scene=...)), and its geometry changes the
oracle decay integral (more surface area -> more hits, smooth-union skin
-> smaller steps -> more lane-steps). This script computes the full
roofline per scene and prints measured-vs-floor, so "many_sphere is 3.2x
slower than neural_raw" decomposes into inherent work vs scheduler loss.

Usage: python benchmarks/exp_csg_roofline.py [--res 1920x1080]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax.numpy as jnp

import cudaneuralrender_tpu as cnr
import roofline


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", default="1920x1080")
    ap.add_argument("--steps", type=int, default=6000)
    ap.add_argument("--model", default="/root/reference/neuralGeometries/plane_1.h5")
    ap.add_argument("--scenes", default="neural_raw,many_sphere,many_cylinder_cut,displacement")
    args = ap.parse_args()
    w, h = (int(v) for v in args.res.split("x"))

    params = cnr.load(args.model)
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    for scene in args.scenes.split(","):
        cfg = cnr.RenderConfig(width=w, height=h, scene=scene,
                               max_steps=args.steps, march_impl="staged")
        # 32-frame batches + double warm-up = the bench suite's exact
        # protocol (an 8-frame batch left ~3 ms/frame of unamortized drain
        # RTT in this table in round 5, biasing every pct low).
        cams = [cnr.Camera(rotation_y=25.0 + 20.0 * i, rotation_x=10.0)
                for i in range(32)]
        frames = [float((i * 40) % 360) for i in range(32)]
        sync(cnr.render_sequence(params, cams, cfg, frames=frames))  # warm
        sync(cnr.render_sequence(params, cams[:1], cfg, frames=frames[:1]))
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            sync(cnr.render_sequence(params, cams, cfg, frames=frames))
            ts.append((time.perf_counter() - t0) / len(cams))
        frame_ms = min(ts) * 1e3

        rf = roofline.compute(params, cam, cfg)
        print(
            f"{scene:18s} measured {frame_ms:7.2f} ms  roofline {rf.roofline_ms:7.2f} ms"
            f"  pct {rf.pct(frame_ms):5.1f}%  floors d/h "
            f"{rf.r_default_ns:.3f}/{rf.r_highest_ns:.3f} ns  useful "
            f"c/r {rf.useful_coarse/1e6:.1f}M/{rf.useful_refine/1e6:.1f}M  "
            f"hits {rf.hits/1e3:.0f}k",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
