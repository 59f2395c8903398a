"""Coarse-phase over-relaxation sweep (kernel-era retune).

relax_omega=1.6 was tuned when one relax factor drove the whole march
(exp_relax.py, XLA path). The coarse phase now runs alone in the megakernel
at eps=0.05 — overshoot there costs a cheap DEFAULT-rate backtrack, so its
optimum may sit higher than the refine phase's. relax_omega applies to the
coarse kernel; relax_omega_refine stays at 1.6.
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
    w, h = 1920, 1080
    params = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    cams = [cnr.Camera(rotation_y=25.0 + 45 * i, rotation_x=10.0) for i in range(4)]
    base = cnr.RenderConfig(width=w, height=h, scene="neural_raw", max_steps=6000,
                            march_impl="staged")

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    ref_hits = None
    for omega in (1.4, 1.6, 1.8, 2.0):
        cfg = base.replace(relax_omega=omega)
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
        print(f"coarse omega={omega}: {ms:8.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f}"
              f" Mrays/s  hit-agree={agree:.6f} slow-frames={slow}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
