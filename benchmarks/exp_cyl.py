"""many_cylinder_cut scheduler gap (round-3 VERDICT #3).

Round 3: 110.3 ms measured vs 63.8 ms per-scene roofline (58%) at 1080p —
the worst tracked number. The scene's compose triples the per-lane-step
floor (DEFAULT 1.53 / HIGHEST 3.24 vs neural 0.45 / 2.37 ns), so every
WASTED lane-step (bucket padding, bounded-rung partial dryness) costs ~3x
more than in neural_raw even though the scheduler wastes the same count.

Levers measured here (16-frame pipelined protocol, animated frames):
  a) baseline (5x5 window)
  b) cyl_window=3 — 9 vs 25 smooth-subtracts per step cuts the compose
     floor itself (config-keyed, so each variant compiles separately)
  c) widened refine schedule (halved divs) — more lanes per rung, fewer
     sorts; checks whether this scene's near set under-fits the ladder
  d) b+c combined
Per-frame stats (steps/overflow/fast-path) printed for the first frame of
each variant to catch hidden overflow retries.
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr


def main():
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    w, h = 1920, 1080
    base = cnr.RenderConfig(width=w, height=h, scene="many_cylinder_cut",
                            max_steps=6000, march_impl="staged")
    cameras = [cnr.Camera(rotation_y=25.0 + 20 * i, rotation_x=10.0)
               for i in range(16)]
    frames = [float(i * 40) for i in range(16)]

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    def widen(cfg):
        return cfg.replace(
            refine_schedule=tuple((max(d // 2, 1), s)
                                  for d, s in cfg.refine_schedule))

    variants = [
        ("base w5", base),
        ("w3", base.replace(cyl_window=3)),
        ("w5 widened", widen(base)),
        ("w3 widened", widen(base.replace(cyl_window=3))),
    ]
    for name, cfg in variants:
        cnr.reset_schedule_memo()
        st = {}
        cnr.render_staged(params, cameras[0], cfg, frame=jnp.float32(0.0),
                          stats_out=st)
        print(f"[{name}] frame0 stats: {st}", flush=True)
        ts = []
        for _ in range(2):
            t0 = time.perf_counter()
            sync(cnr.render_sequence(params, cameras, cfg, frames=frames))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / 16 * 1e3
        print(f"[{name}] {ms:7.1f} ms/frame  {w*h/ (ms/1e3) / 1e6:6.1f} "
              f"Mrays/s", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
