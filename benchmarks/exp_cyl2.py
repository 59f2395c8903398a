"""Per-rung cost breakdown for many_cylinder_cut vs neural_raw (round 4).

many_cylinder_cut at cyl_window=3 measures ~92.6 ms vs a ~48 ms roofline;
neural_raw's scheduler overhead is ~9 ms, so this scene wastes ~4x more
lane-steps. Where? Time `_render_scheduled` with PREFIXES of the refine
schedule (each prefix is its own config -> own compiled program; stats
fetch only, no host fallback) — marginal deltas attribute cost per rung.

Run: python benchmarks/exp_cyl2.py
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.render.renderer import _render_scheduled


def main():
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    w, h = 1920, 1080
    base = cnr.RenderConfig(width=w, height=h, max_steps=6000,
                            march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    full_sched = base.refine_schedule

    def timeit(cfg, frame, reps=4):
        fr = jnp.asarray(frame, jnp.float32)

        def run():
            _, _, stats = _render_scheduled(params, cam, cfg, None, fr)
            return np.asarray(stats)

        st = run()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run()
            ts.append(time.perf_counter() - t0)
        return float(np.min(ts)) * 1e3, st

    for scene, frame in (("neural_raw", 0.0), ("many_cylinder_cut", 0.0)):
        print(f"[{scene}]", flush=True)
        # pseudo-baseline: coarse phase + entry sort + a 1-step rung 0
        ms0, st0 = timeit(base.replace(scene=scene,
                                       refine_schedule=((4, 1),)), frame)
        print(f"  coarse + entry + 1-step rung:    {ms0:7.1f} ms  "
              f"stats {st0.tolist()}", flush=True)
        prev = ms0
        for k in range(1, len(full_sched) + 1):
            cfg = base.replace(scene=scene,
                               refine_schedule=full_sched[:k])
            ms, st = timeit(cfg, frame)
            print(f"  rungs {full_sched[:k]}: {ms:7.1f} ms  "
                  f"(marginal {ms - prev:+6.1f})  stats {st.tolist()}",
                  flush=True)
            prev = ms
    return 0


if __name__ == "__main__":
    sys.exit(main())
