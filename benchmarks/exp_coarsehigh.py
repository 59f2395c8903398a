"""Coarse phase at emulated-HIGH precision (3-pass, eps=1e-3) vs DEFAULT
(eps=0.05): the run-to-dry kernel is need-driven (per-tile exit), so paying
~25% more per coarse step should shrink the refine near set and its start
distance enough to cut the HIGHEST ladder's cost. Refine schedules sized
for the smaller near set are swept alongside. Protocol = bench.py (8
pipelined frames)."""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr

CANDIDATES = {
    "base DEFAULT/0.05": dict(),
    "HIGH/1e-3 refine=D": dict(coarse_precision="high", coarse_eps=1e-3),
    "HIGH/1e-3 refine N/8": dict(
        coarse_precision="high", coarse_eps=1e-3,
        refine_schedule=((8, 12), (16, 24), (64, 64), (256, 0)),
    ),
    "HIGH/1e-3 refine N/8 short": dict(
        coarse_precision="high", coarse_eps=1e-3,
        refine_schedule=((8, 8), (32, 24), (128, 0)),
    ),
}


def main():
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cams = [cnr.Camera(rotation_y=25.0 + 20 * i, rotation_x=10.0) for i in range(8)]
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    ref_hits = None
    for name, kw in CANDIDATES.items():
        cfg = base.replace(**kw)
        stats = []
        imgs = cnr.render_sequence(params, cams, cfg, stats_out=stats)
        sync(imgs)
        slow = sum(1 for s in stats if not s["fast_path"])
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
        print(f"{name:27s}: {ms:8.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s"
              f"  hit-agree={agree:.6f}  slow-frames={slow}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
