"""Multigeom batching penalty decomposition (round-4 VERDICT item 4).

Round 4 recorded multigeom5 at ~35 Mrays/s vs ~45 single-geometry — a
"22%/geometry batching penalty" with no experiment behind it. Hypothesis:
it is not a BATCHING penalty at all but geometry MIX difficulty — the
5-geometry group includes car_1-class shapes whose near-surface sets
(and hence refine work) are ~1.8x plane_1's (the adaptive caps the memo
learns per geometry make this visible: car_1 745k vs plane_1 418k lanes
in rung 0).

Protocol (pipelined, one drain per batch):
  A. each geometry ALONE x15 programs -> its individual Mrays/s;
  B. the 5-geometry group x3 (the bench suite's multigeom protocol);
  C. plane_1 alone x15 (the headline-like baseline).
Expected group rate = harmonic mean of A (each frame costs 1/rate_g);
penalty = B vs that expectation. Also prints per-geometry stats from
render_batch_staged(stats_out=...).
"""
from __future__ import annotations

import glob
import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

import cudaneuralrender_tpu as cnr
from cudaneuralrender_tpu.models import mlp as mlp_lib
from cudaneuralrender_tpu.render import multigeom


def main() -> int:
    w, h = 1920, 1080
    cfg = cnr.RenderConfig(width=w, height=h, scene="neural_raw",
                           max_steps=6000, march_impl="staged")
    cam = cnr.Camera(rotation_y=25.0, rotation_x=10.0)

    ref = cnr.load("/root/reference/neuralGeometries/plane_1.h5")
    group, names = [], []
    for p in sorted(glob.glob("/root/reference/neuralGeometries/*.h5")):
        try:
            q = cnr.load(p)
        except Exception:
            continue
        if mlp_lib.layer_sizes(q) == mlp_lib.layer_sizes(ref):
            group.append(q)
            names.append(_os.path.basename(p))
    group, names = group[:5], names[:5]

    def sync(xs):
        return float(jnp.stack([x.sum() for x in xs]).sum())

    def timed(batch, reps=2):
        sync(multigeom.render_batch_staged(batch, cam, cfg))  # warm + teach
        sync(multigeom.render_batch_staged(batch, cam, cfg))  # tuned compile
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(multigeom.render_batch_staged(batch, cam, cfg))
            ts.append((time.perf_counter() - t0) / len(batch))
        return min(ts)

    rates = {}
    for name, g in zip(names, group):
        dt = timed([g] * 15)
        rates[name] = w * h / dt
        print(f"{name:44s}: {dt*1e3:7.2f} ms/frame  "
              f"{rates[name]/1e6:6.2f} Mrays/s", flush=True)

    harmonic = len(group) / sum(1.0 / r for r in rates.values())
    dt_b = timed(list(group) * 3)
    rate_b = w * h / dt_b
    print(f"\n5-geometry group x3 (suite protocol): {dt_b*1e3:7.2f} ms/frame "
          f"{rate_b/1e6:6.2f} Mrays/s", flush=True)
    print(f"expected from individual rates (harmonic): "
          f"{harmonic/1e6:6.2f} Mrays/s", flush=True)
    print(f"true batching penalty: {(1 - rate_b/harmonic)*100:+.1f}%",
          flush=True)

    st: list = []
    multigeom.render_batch_staged(group, cam, cfg, stats_out=st)
    for name, s in zip(names, st):
        print(f"{name:44s}: steps={s['steps']:5d} hits={s['hits']:7d} "
              f"rung0={s['rung_actives'][0]:7d} caps={s['refine_caps']}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
