"""Mid-phase retry with a SHRUNK HIGHEST phase (the exp_mid fix).

exp_stepcost measured the in-kernel per-lane-step rates precisely:
HIGHEST 2.35 ns, emulated 3-pass HIGH 1.19 ns, DEFAULT 0.43 ns. exp_mid's
mid phase lost because its HIGHEST polish phase re-marched the whole
n/4-wide near bucket. But after a RUN-TO-DRY mid phase at eps 1e-3, the
HIGHEST phase's input is only the converged-at-mid set (final hits + a
thin halo — a few % of the image), so its ladder can start at n/16 and a
handful of polish steps (1e-3 -> 1e-6 at contraction ~0.5 is ~10 steps).
Overflow (foreground-heavy cameras) now falls back to doubled buckets
instead of a full re-render, so thin margins are safe.

RESULT: dead end, twice over. (1) hits alone are ~172k at 1080p (8.3%), so
converged-at-mid exceeds n/16 and even n/8 margins force slow-path frames
(measured 158-289 ms/frame vs 66 base). (2) More fundamentally: the deep
straggler tail lives at d in (1e-6, 1e-3), where the HIGH phase's 2.2e-4
SDF error is 20-200% of d — that tail genuinely needs HIGHEST. The mid
phase can only cheapen rung 1's bulk approach (~12 ms of 29), which its own
entry sort + polish-phase duplication eats. Kept as the record of WHY
mid_eps stays off; see also exp_mid.py and docs/ARCHITECTURE.md.
"""
from __future__ import annotations

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr

D = ((4, 16), (8, 24), (32, 64), (256, 0))

CANDIDATES = {
    "base mixed (no mid)": dict(),
    "mid=D, hi ((8,12),(32,32),(256,0))": dict(
        mid_eps=1e-3, mid_schedule=D,
        refine_schedule=((8, 12), (32, 32), (256, 0)),
    ),
    "mid=D, hi ((16,12),(64,32),(256,0))": dict(
        mid_eps=1e-3, mid_schedule=D,
        refine_schedule=((16, 12), (64, 32), (256, 0)),
    ),
    "mid=D, hi ((16,8),(64,24),(256,0))": dict(
        mid_eps=1e-3, mid_schedule=D,
        refine_schedule=((16, 8), (64, 24), (256, 0)),
    ),
    "mid=((4,12),(8,16),(32,48),(256,0)), hi ((16,12),(64,32),(256,0))": dict(
        mid_eps=1e-3, mid_schedule=((4, 12), (8, 16), (32, 48), (256, 0)),
        refine_schedule=((16, 12), (64, 32), (256, 0)),
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
        print(f"{name:64s}: {ms:8.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s"
              f"  hit-agree={agree:.6f} slow-frames={slow}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
