"""Second refine-ladder sweep: finer rungs.

Integrating the measured decay curve (benchmarks/exp_decay.py), the
committed 4-rung ladder schedules ~19M lane-steps at HIGHEST where the
decay integral is ~7M — bucket granularity wastes ~2.7x. These candidates
track the curve with ~1.4x headroom per rung (overflow is safe — leftover
actives fall through to later rungs / host continuation — but slow).

Decay (max of ry=25/65): 0:330k 4:325k 8:300k 16:166k 24:93k 32:54k
48:21k 64:13k 96:2.8k 136:1.0k 200:0.3k.
"""
from __future__ import annotations

import sys
import time

import os as _os

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr

CANDIDATES = {
    # committed (exp_sched3 winner): ~13.9M lane-steps + tail
    "D cur 4/8/32/256": ((4, 16), (8, 24), (32, 64), (256, 0)),
    # 8 rungs, 1.4x headroom: ~13M -> but finer early rungs
    "G 8rung": ((4, 8), (5, 8), (8, 8), (16, 8), (24, 16), (64, 16), (96, 32), (256, 0)),
    # 6 rungs: drop the tightest (risky N/5) and one mid rung
    "H 6rung": ((4, 8), (6, 16), (16, 8), (24, 16), (64, 48), (256, 0)),
    # 6 rungs, powers of two only, generous margins
    "I 6rung pow2": ((4, 8), (8, 16), (16, 8), (32, 16), (64, 48), (256, 0)),
    # 5 rungs
    "J 5rung": ((4, 12), (8, 12), (16, 16), (48, 56), (256, 0)),
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
    for name, sched in CANDIDATES.items():
        cfg = base.replace(refine_schedule=sched)
        imgs = cnr.render_sequence(params, cams, cfg)
        sync(imgs)  # compile + warm
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
        print(f"{name:22s}: {ms:8.2f} ms/frame  {w*h/np.min(times)/1e6:6.2f} Mrays/s"
              f"  hit-agree={agree:.6f}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
