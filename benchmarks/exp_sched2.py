"""Measure the reworked staged schedule at 1080p: tail_pallas off/on,
plus hit-parity check between the two and vs the full-precision path."""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr


def timed(name, fn, *args, reps=5, **kw):
    out = fn(*args, **kw)
    s = float(jnp.sum(out))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args, **kw)))
        ts.append(time.perf_counter() - t0)
    print(f"{name:40s}: {np.median(ts)*1e3:9.2f} ms (min {np.min(ts)*1e3:8.2f}) sum={s:.2f}", flush=True)
    return out


def main():
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cams = [cnr.Camera(rotation_y=25.0 + 20 * i, rotation_x=10.0) for i in range(3)]
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")

    img_a = timed("staged mixed (new ladder)", cnr.render_staged, params, cams[0], base)
    img_b = timed("staged mixed + tail_pallas",
                  cnr.render_staged, params, cams[0], base.replace(tail_pallas=True))

    hit_a = np.asarray(img_a[..., 3]) > 0
    hit_b = np.asarray(img_b[..., 3]) > 0
    print(f"hit agreement tail vs xla: {(hit_a == hit_b).mean():.6f} "
          f"(hits {hit_a.sum()} vs {hit_b.sum()})", flush=True)

    img_f = timed("staged FULL precision",
                  cnr.render_staged, params, cams[0], base.replace(march_precision="full"),
                  reps=3)
    hit_f = np.asarray(img_f[..., 3]) > 0
    both = hit_a & hit_f
    d = np.abs(np.asarray(img_a)[..., :3][both] - np.asarray(img_f)[..., :3][both])
    print(f"mixed-vs-full: hit agreement {(hit_a == hit_f).mean():.6f}, "
          f"color max|d|={d.max():.4f} mean={d.mean():.5f}", flush=True)

    # second camera to confirm no recompiles + schedule robustness
    for i, cam in enumerate(cams[1:], 1):
        timed(f"staged mixed cam{i}", cnr.render_staged, params, cam, base, reps=3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
