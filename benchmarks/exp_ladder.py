"""A/B the optional HIGH middle phase (mid_eps) and shade bucket size at 1080p."""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

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
    print(f"{name:44s}: {np.median(ts)*1e3:9.2f} ms (min {np.min(ts)*1e3:8.2f}) sum={s:.2f}", flush=True)
    return out


def main():
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)
    base = cnr.RenderConfig(width=1920, height=1080, scene="neural_raw",
                            max_steps=6000, march_impl="staged")

    a = timed("prepass4 + shadeHIGH (new default)", cnr.render_staged, params, cam, base)
    b = timed("no prepass", cnr.render_staged, params, cam,
              base.replace(prepass_factor=0))
    c = timed("prepass8", cnr.render_staged, params, cam,
              base.replace(prepass_factor=8))
    d = timed("prepass4 + mid_eps=1e-3", cnr.render_staged, params, cam,
              base.replace(mid_eps=1e-3))
    e = timed("prepass4 + shade HIGHEST", cnr.render_staged, params, cam,
              base.replace(shade_precision="highest"))
    hit_a = np.asarray(a[..., 3]) > 0
    for name, img in (("no-prepass", b), ("prepass8", c), ("mid", d), ("shadeHST", e)):
        h = np.asarray(img[..., 3]) > 0
        print(f"hit agreement {name}: {(hit_a == h).mean():.6f}", flush=True)
    err = np.abs(np.asarray(a) - np.asarray(e))
    print(f"shade HIGH-vs-HIGHEST color max|d|={err.max():.5f} mean={err.mean():.7f}", flush=True)
    timed("prepass4 + stage_steps=8", cnr.render_staged, params, cam,
          base.replace(stage_steps=8))
    timed("prepass4 + shade_div=16", cnr.render_staged, params, cam,
          base.replace(shade_div=16))
    return 0


if __name__ == "__main__":
    sys.exit(main())
