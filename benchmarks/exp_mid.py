"""Mid-precision ladder phase (emulated 3-pass HIGH in the megakernel).

With mid_eps > 0 the near set marches HIGH (3 bf16 passes, ~2e-4 SDF error)
down to 1e-3 before the HIGHEST (6-pass) phase polishes to 1e-6 — moving
the bulk of refine lane-steps to ~60% cost. Earlier measurement (459 vs
334 ms) predates in-kernel rungs; this re-tests with both phases in the
megakernel and a shortened HIGHEST schedule (rays then start ~1e-3 out).
"""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr

D = ((4, 16), (8, 24), (32, 64), (256, 0))

CANDIDATES = {
    "base mixed (no mid)": dict(),
    "mid, refine=D": dict(mid_eps=1e-3, mid_schedule=D),
    "mid, refine short": dict(
        mid_eps=1e-3, mid_schedule=D,
        refine_schedule=((4, 8), (16, 16), (64, 32), (256, 0)),
    ),
    "mid, refine shorter": dict(
        mid_eps=1e-3, mid_schedule=D,
        refine_schedule=((4, 4), (16, 12), (128, 0)),
    ),
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
    for name, kw in CANDIDATES.items():
        cfg = base.replace(**kw)
        imgs = cnr.render_sequence(params, cams, cfg)
        sync(imgs)
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
        print(f"{name:24s}: {ms:8.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s"
              f"  hit-agree={agree:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
