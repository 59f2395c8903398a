"""A/B: difficulty-ordered refine packing on/off (config.ordered_packing),
same process, interleaved reps to control for tunnel drift."""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr


def main():
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cams = [cnr.Camera(rotation_y=25.0 + 20 * i, rotation_x=10.0) for i in range(3)]
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")
    cfgs = {"ordered": base, "image-order": base.replace(ordered_packing=False)}

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    for name, cfg in cfgs.items():  # compile + warm both first
        sync(cnr.render_sequence(params, cams, cfg))
    times = {k: [] for k in cfgs}
    for _ in range(4):  # interleave
        for name, cfg in cfgs.items():
            t0 = time.perf_counter()
            sync(cnr.render_sequence(params, cams, cfg))
            times[name].append((time.perf_counter() - t0) / len(cams))
    for name, ts in times.items():
        ms = np.min(ts) * 1e3
        print(f"{name:12s}: {ms:8.2f} ms/frame  {w*h/np.min(ts)/1e6:6.2f} Mrays/s"
              f"  (median {np.median(ts)*1e3:.2f})", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
